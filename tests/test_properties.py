"""Property-based invariants (hypothesis) for the stateful operators.

Random inputs exercise branch interleavings no example-based test pins:
reset chains, oversize runs, equal-timestamp-free orderings. Spark
round-trips are slow, so each property drives the PURE core (the same
code the Spark operator executes per group via pandas/Python) — the
Spark-vs-oracle equality of the wrapped operators is already covered by
the 77 registry checks; these pin the algebraic invariants of the folds
themselves.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from homelogging_spark.operators.battery import simulate_battery_series

# --- pure re-statements of the fold bodies (kept tiny; the Spark
# operators run these same recurrences per group) -----------------------------


def greedy_pack(tokens: list[int], capacity: int):
    # reference implementation mirroring operators/packing.py's fold
    out = []
    pack_id, pos, fill = 0, 0, 0
    for n in tokens:
        if pos > 0 and fill + n > capacity:
            pack_id, pos, fill = pack_id + 1, 0, 0
        pos += 1
        fill += n
        out.append((pack_id, pos, fill))
    return out


def rollover_accumulate(raws: list[float], eps: float = 0.0):
    offset, prev = 0.0, None
    out = []
    for raw in raws:
        if prev is not None and raw < prev - eps:
            offset += prev
        out.append((offset, raw + offset))
        prev = raw
    return out


class TestPackingProperties:
    @given(
        st.lists(st.integers(min_value=1, max_value=700), max_size=60),
        st.integers(min_value=16, max_value=512),
    )
    @settings(max_examples=200, deadline=None)
    def test_pack_invariants(self, tokens, capacity):
        out = greedy_pack(tokens, capacity)
        fill_by_pack: dict[int, int] = {}
        last_pack = 0
        for (pack_id, pos, fill), n in zip(out, tokens):
            # pack ids are non-decreasing and contiguous
            assert pack_id in (last_pack, last_pack + 1)
            last_pack = pack_id
            # pack_fill is the running sum within the pack
            fill_by_pack[pack_id] = fill_by_pack.get(pack_id, 0) + n
            assert fill == fill_by_pack[pack_id]
            # position restarts at 1 on a new pack
            assert pos >= 1
        for pack_id, fill in fill_by_pack.items():
            members = [
                n for (p, _, _), n in zip(out, tokens) if p == pack_id
            ]
            # a pack only exceeds capacity if it is a single oversize doc
            assert fill <= capacity or len(members) == 1
        # no token lost
        assert sum(fill_by_pack.values()) == sum(tokens)

    @given(st.lists(st.integers(min_value=1, max_value=100), max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_pack_never_splits_better_than_lower_bound(self, tokens):
        capacity = 128
        out = greedy_pack(tokens, capacity)
        n_packs = (max(p for p, _, _ in out) + 1) if out else 0
        # first-fit uses at least ceil(total/capacity) packs (all tokens
        # here fit capacity, so the bound is valid)
        assert n_packs >= math.ceil(sum(tokens) / capacity)


class TestRolloverProperties:
    @given(
        st.lists(
            st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
            max_size=60,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_corrected_is_monotone_and_offset_nonnegative(self, raws):
        out = rollover_accumulate(raws)
        prev_corr = None
        for (offset, corrected), raw in zip(out, raws):
            assert offset >= 0.0
            assert corrected == raw + offset
            if prev_corr is not None:
                # monotone non-decreasing within float tolerance
                assert corrected >= prev_corr - 1e-9 * max(1.0, abs(prev_corr))
            prev_corr = corrected

    @given(
        st.lists(
            st.floats(min_value=0.0, max_value=1e3, allow_nan=False),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_monotone_input_never_corrects(self, raws):
        raws = sorted(raws)
        out = rollover_accumulate(raws)
        assert all(offset == 0.0 for offset, _ in out)


class TestBatteryProperties:
    @given(
        st.lists(
            st.floats(min_value=-3000.0, max_value=3000.0, allow_nan=False),
            max_size=80,
        )
    )
    @settings(max_examples=150, deadline=None)
    def test_soc_clamped_and_totals_monotone(self, powers):
        cap, eff, maxp = 2.7, 0.9, 0.8
        states = simulate_battery_series(powers, cap, eff, maxp)
        prev_ch = prev_dch = 0.0
        for soc, charged, discharged, cycles in states:
            assert -1e-12 <= soc <= cap + 1e-12
            assert charged >= prev_ch - 1e-12
            assert discharged >= prev_dch - 1e-12
            assert cycles >= 0.0
            prev_ch, prev_dch = charged, discharged

    @given(
        st.lists(
            st.floats(min_value=0.0, max_value=3000.0, allow_nan=False),
            max_size=50,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_import_only_never_charges(self, powers):
        # strictly importing (power > 0) can only discharge; an empty
        # battery then never moves
        states = simulate_battery_series(powers, 2.7, 0.9, 0.8)
        for soc, charged, _, _ in states:
            assert charged == 0.0
            assert soc == 0.0


def chunk_starts(n: int, chunk: int, stride: int) -> list[int]:
    # reference implementation mirroring operators/chunking._chunk_starts
    n_starts = (max(0, n - chunk) + stride - 1) // stride + 1
    return [1 + i * stride for i in range(n_starts)]


def ewma_fold(xs: list[float], alpha: float = 0.25):
    # mirrors aggregations.ewma_smooth / streaming.stateful.make_ewma_apply
    s = None
    out = []
    for x in xs:
        if s is None:
            s, r = x, 0.0
        else:
            r = x - s
            s = alpha * x + (1.0 - alpha) * s
        out.append((s, r))
    return out


def union_sweep(positions: list[int], k: int) -> int:
    # mirrors the window-max interval sweep in chunking.duplicated_passages
    total, prev_end = 0, 0
    for pos in sorted(positions):
        total += max(0, (pos + k) - max(prev_end, pos))
        prev_end = max(prev_end, pos + k)
    return total


class TestChunkGridProperties:
    @given(
        st.integers(min_value=0, max_value=2000),
        st.integers(min_value=2, max_value=128),
        st.integers(min_value=1, max_value=128),
    )
    @settings(max_examples=300, deadline=None)
    def test_grid_covers_every_token_minimally(self, n, chunk, stride):
        stride = min(stride, chunk)  # overlap requires stride <= chunk
        starts = chunk_starts(n, chunk, stride)
        assert starts[0] == 1
        assert all(b - a == stride for a, b in zip(starts, starts[1:]))
        covered = set()
        for s in starts:
            covered.update(range(s, min(s + chunk, n + 1)))
        assert covered == set(range(1, n + 1))
        # minimal: dropping the last window must lose coverage (unless
        # the doc fits in one window)
        if len(starts) > 1:
            partial = set()
            for s in starts[:-1]:
                partial.update(range(s, min(s + chunk, n + 1)))
            assert partial != set(range(1, n + 1))


class TestEwmaProperties:
    @given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_smoothed_stays_in_input_hull_and_contracts(self, xs):
        out = ewma_fold(xs)
        lo, hi = min(xs), max(xs)
        s_prev = None
        for (s, r), x in zip(out, xs):
            assert lo - 1e-6 <= s <= hi + 1e-6  # convex combination
            if s_prev is not None:
                # the update moves the estimate TOWARD the new sample
                assert abs(s - x) <= abs(s_prev - x) + 1e-9
                assert r == x - s_prev
            s_prev = s


class TestUnionSweepProperties:
    @given(
        st.lists(st.integers(min_value=1, max_value=500), max_size=80),
        st.integers(min_value=1, max_value=16),
    )
    @settings(max_examples=300, deadline=None)
    def test_sweep_equals_set_union(self, positions, k):
        direct = set()
        for p in positions:
            direct.update(range(p, p + k))
        assert union_sweep(positions, k) == len(direct)


class TestWavDecodeProperties:
    """decode_basic_audio round-trip: for ANY int16 sample list and
    channel layout, building a canonical WAV and decoding it must
    recover the exact frame count and the numpy-computed RMS — and the
    parse must be invariant to extra metadata chunks between fmt and
    data (word-aligned odd-sized ones included)."""

    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
        ),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=9),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_recovers_samples_and_rms(self, samples, n_channels, junk_len):
        import struct

        import numpy as np

        from homelogging_spark.operators.multimodal import decode_basic_audio

        n_frames = len(samples) // n_channels
        used = samples[: n_frames * n_channels]
        if not used:
            return  # fewer samples than one frame: nothing to assert
        pcm = b"".join(struct.pack("<h", s) for s in used)
        block = n_channels * 2
        fmt = struct.pack("<HHIIHH", 1, n_channels, 8000, 8000 * block, block, 16)
        junk = bytes(range(junk_len % 256 if junk_len else 0))[:junk_len]
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00" * (len(junk) & 1)
        chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

        n_ch, rate, n_out, rms = decode_basic_audio(wav)
        assert (n_ch, rate, n_out) == (n_channels, 8000, n_frames)
        x = np.array(used, dtype=np.float64) / 32768.0
        assert math.isclose(rms, float(np.sqrt(np.mean(x * x))), rel_tol=1e-12)


def ntile5_closed_form(r: int, n: int) -> int:
    """The curriculum_order quintile formula (llm_registry.py): SQL
    ntile(5) as a pure function of global rank r (1-based) and total n."""
    rem = n % 5
    q_sz = (n - rem) // 5
    if r <= rem * (q_sz + 1):
        return -(-r // (q_sz + 1))  # ceil
    return rem + -(-(r - rem * (q_sz + 1)) // q_sz)


class TestNtileClosedForm:
    def test_matches_real_ntile_for_every_small_n(self):
        """The distributed curriculum plan derives the quintile stage
        from this closed form instead of a global-window ntile; if the
        formula drifted from SQL-standard ntile semantics (first n%5
        buckets take the extra row) the oracle hash would catch it only
        at the fixture's single N — pin it for EVERY n up to 500
        against DuckDB's ntile."""
        import duckdb

        con = duckdb.connect()
        for n in list(range(1, 60)) + [63, 97, 100, 101, 250, 499, 500]:
            got = [ntile5_closed_form(r, n) for r in range(1, n + 1)]
            want = [
                row[0]
                for row in con.execute(
                    f"SELECT ntile(5) OVER (ORDER BY r) FROM range(1, {n + 1}) t(r)"
                ).fetchall()
            ]
            assert got == want, f"n={n}"


# --- sketch family laws (operators/sketches.py) -------------------------------
# Pure restatements of the md5-deterministic sketch builds; the Spark
# and DuckDB forms compute these exact integers (pinned bit-for-bit in
# test_sketches), so laws proven here hold for the engine operators.


def _h52(key: str, salt: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:13], 16)


def kmv_pure(keys: list[str], k: int, salt: str = "kmv") -> list[int]:
    return sorted({_h52(x, salt) for x in keys})[:k]


def kmv_merge_pure(a: list[int], b: list[int], k: int) -> list[int]:
    return sorted(set(a) | set(b))[:k]


def bloom_words_pure(keys: list[str], m: int, j: int, salt: str = "bloom"):
    words: dict[int, int] = {}
    for x in keys:
        for i in range(j):
            pos = _h52(x, f"{salt}|{i}") % m
            words[pos // 63] = words.get(pos // 63, 0) | (1 << (pos % 63))
    return words


def cm_regs_pure(keys: list[str], depth: int, width: int, salt: str = "cm"):
    regs: dict[tuple[int, int], int] = {}
    for x in keys:
        for r in range(depth):
            c = _h52(x, f"{salt}|{r}") % width
            regs[(r, c)] = regs.get((r, c), 0) + 1
    return regs


_keys = st.lists(st.text(min_size=0, max_size=8), max_size=80)


class TestSketchProperties:
    @given(_keys, _keys, st.integers(min_value=1, max_value=32))
    @settings(max_examples=200, deadline=None)
    def test_kmv_merge_closure_universal(self, a, b, k):
        """merge(sketch(A), sketch(B)) == sketch(A ∪ B) for EVERY input
        pair and every k — the law that makes per-partition / per-day
        rollups exact, not approximately-composable."""
        assert kmv_merge_pure(
            kmv_pure(a, k), kmv_pure(b, k), k
        ) == kmv_pure(a + b, k)

    @given(_keys, st.integers(min_value=1, max_value=32))
    @settings(max_examples=100, deadline=None)
    def test_kmv_idempotent_and_exact_below_k(self, a, k):
        s = kmv_pure(a, k)
        # replay-idempotence (the streaming rollup's crash guarantee)
        assert kmv_merge_pure(s, s, k) == s
        # unsaturated sketch IS the exact distinct hash set
        if len({_h52(x, "kmv") for x in a}) <= k:
            assert set(s) == {_h52(x, "kmv") for x in a}

    @given(
        _keys,
        st.integers(min_value=64, max_value=4096),
        st.integers(min_value=1, max_value=7),
    )
    @settings(max_examples=100, deadline=None)
    def test_bloom_no_false_negatives_universal(self, keys, m, j):
        """Every inserted key probes present, for EVERY (m, j) — the
        guarantee that makes the pre-gate safe at any dial setting."""
        words = bloom_words_pure(keys, m, j)
        for x in keys:
            for i in range(j):
                pos = _h52(x, f"bloom|{i}") % m
                assert words.get(pos // 63, 0) >> (pos % 63) & 1

    @given(_keys, _keys, st.integers(min_value=64, max_value=1024))
    @settings(max_examples=100, deadline=None)
    def test_bloom_merge_closure_universal(self, a, b, m):
        wa, wb = bloom_words_pure(a, m, 4), bloom_words_pure(b, m, 4)
        merged = {
            w: wa.get(w, 0) | wb.get(w, 0) for w in set(wa) | set(wb)
        }
        assert merged == bloom_words_pure(a + b, m, 4)

    @given(_keys, st.integers(min_value=1, max_value=4), st.integers(min_value=4, max_value=64))
    @settings(max_examples=100, deadline=None)
    def test_cm_never_undercounts_universal(self, keys, depth, width):
        """min over a key's registers ≥ its true multiplicity for EVERY
        input multiset and dial — the one-sided-error law."""
        regs = cm_regs_pure(keys, depth, width)
        from collections import Counter

        for x, n in Counter(keys).items():
            est = min(
                regs[(r, _h52(x, f"cm|{r}") % width)] for r in range(depth)
            )
            assert est >= n

    @given(_keys, _keys, st.integers(min_value=4, max_value=64))
    @settings(max_examples=100, deadline=None)
    def test_cm_merge_is_register_sum_universal(self, a, b, width):
        ra, rb = cm_regs_pure(a, 3, width), cm_regs_pure(b, 3, width)
        merged = {
            c: ra.get(c, 0) + rb.get(c, 0) for c in set(ra) | set(rb)
        }
        assert merged == cm_regs_pure(a + b, 3, width)


# --- pattern-match z-norm laws (operators/tsmatch.py) -------------------------


def _znorm_pure(xs: list[float]) -> list[float]:
    mu = sum(xs) / len(xs)
    var = sum((x - mu) ** 2 for x in xs) / len(xs)
    sd = math.sqrt(var)
    return [(x - mu) / sd for x in xs] if sd > 0 else [0.0] * len(xs)


def _zdist(a: list[float], b: list[float]) -> float:
    za, zb = _znorm_pure(a), _znorm_pure(b)
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(za, zb)))


# integer-valued windows with real spread: the laws are exact
# mathematics; degenerate float regimes (spread below the addition's
# ulp, e.g. [0, 1e-45] + 1.0) are cancellation artifacts, not law
# violations, so the strategy stays in numerically meaningful territory
_win = st.lists(
    st.integers(min_value=-1000, max_value=1000).map(float),
    min_size=2,
    max_size=24,
).filter(lambda w: max(w) - min(w) >= 1.0)


class TestPatternMatchProperties:
    @given(
        _win,
        st.floats(min_value=1e-3, max_value=1e3),
        st.floats(min_value=-1e4, max_value=1e4),
    )
    @settings(max_examples=200, deadline=None)
    def test_affine_invariance(self, w, a, b):
        """dist(a·w + b, p) == dist(w, p) for every a > 0, b — the
        invariance that makes the matcher a SHAPE search. Evaluated via
        the z-norm core the Spark column algebra restates."""
        p = [float(x) for x in range(len(w))]  # fixed shaped pattern
        scaled = [a * x + b for x in w]
        d0, d1 = _zdist(w, p), _zdist(scaled, p)
        assert math.isclose(d0, d1, rel_tol=1e-6, abs_tol=1e-6)

    @given(_win)
    @settings(max_examples=200, deadline=None)
    def test_self_distance_zero_and_bounded(self, w):
        """dist(w, w) == 0, and every z-normalized distance is bounded
        by 2·√L (both vectors lie on the radius-√L sphere)."""
        assert abs(_zdist(w, w)) <= 1e-9
        other = list(reversed(w))
        L = len(w)
        assert _zdist(w, other) <= 2.0 * math.sqrt(L) + 1e-9


# --- SCD2: stream == batch under ANY micro-batch split ------------------------


def scd2_closed_reference(obs):
    """Pure reference: closed versions of one key's observation log
    [(ts_us, attr)] (ts-sorted) — the rows batch scd2_history emits with
    valid_to IS NOT NULL, and exactly what draining the stream yields."""
    closed = []
    version, vf, attr, n = 0, None, None, 0
    for ts, a in obs:
        if version == 0:
            version, vf, attr, n = 1, ts, a, 1
        elif a == attr:  # None == None is True in Python — null-safe
            n += 1
        else:
            closed.append((version, vf, ts, attr, n))
            version, vf, attr, n = version + 1, ts, a, 1
    return closed


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


@given(
    attrs=st.lists(
        st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=40,
    ),
    splits=st.lists(st.integers(min_value=1, max_value=39), max_size=5),
)
@settings(max_examples=60, deadline=None)
def test_scd2_stream_equals_reference_under_any_batch_split(attrs, splits):
    """Closed-version output of the streaming SCD2 apply must be a pure
    function of the observation log — identical for EVERY way the log is
    cut into micro-batches (the state carries the open version across
    any boundary), and equal to the batch-semantics reference."""
    import pandas as pd

    from homelogging_spark.streaming.stateful import make_scd2_apply

    obs = [(1_000_000 * (i + 1), a) for i, a in enumerate(attrs)]
    expected = scd2_closed_reference(obs)

    cuts = sorted({s for s in splits if s < len(obs)})
    bounds = [0] + cuts + [len(obs)]
    batches = [obs[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if hi > lo]

    apply = make_scd2_apply()
    state = _FakeGroupState()
    closed = []
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(ts, unit="us") for ts, _ in batch],
                "attr": [a for _, a in batch],
            }
        )
        for out in apply(("k",), iter([pdf]), state):
            for r in out.itertuples():
                closed.append(
                    (
                        r.version,
                        int(r.valid_from.value // 1_000),
                        int(r.valid_to.value // 1_000),
                        None if pd.isna(r.attr) else r.attr,
                        r.n_obs,
                    )
                )
    assert closed == expected


# --- LOCF grid: stream == reference under ANY micro-batch split ---------------


def grid_locf_closed_reference(obs, step_us=3_600_000_000):
    """Pure reference: closed grid slots for one key's (ts_us, value)
    log (ts-sorted) — what draining streaming_grid_locf yields."""
    out = []
    cur_h, cur_val = None, None
    for ts, v in obs:
        h = ts - ts % step_us
        if cur_h is None:
            cur_h, cur_val = h, v
        elif h == cur_h:
            cur_val = v
        elif h > cur_h:
            out.append((cur_h, cur_val, cur_val, False))
            g = cur_h + step_us
            while g < h:
                out.append((g, None, cur_val, True))
                g += step_us
            cur_h, cur_val = h, v
    return out


@given(
    deltas=st.lists(
        st.integers(min_value=1, max_value=10_000), min_size=1, max_size=30
    ),
    splits=st.lists(st.integers(min_value=1, max_value=29), max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_grid_locf_stream_equals_reference_under_any_batch_split(deltas, splits):
    """Closed-slot output of the streaming LOCF apply must be identical
    for EVERY way the observation log is cut into micro-batches (the
    open slot carries in state across any boundary) and equal the pure
    batch-semantics reference. Random inter-arrival gaps in seconds up
    to ~2.7 h exercise same-slot updates, adjacent slots, and multi-slot
    gap fills."""
    import pandas as pd

    from homelogging_spark.streaming.stateful import make_grid_locf_apply

    ts, obs = 0, []
    for i, d in enumerate(deltas):
        ts += d * 1_000_000
        obs.append((ts, float(i)))
    expected = grid_locf_closed_reference(obs)

    cuts = sorted({s for s in splits if s < len(obs)})
    bounds = [0] + cuts + [len(obs)]
    batches = [obs[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if hi > lo]

    apply = make_grid_locf_apply()
    state = _FakeGroupState()
    closed = []
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "ts": [pd.Timestamp(t, unit="us") for t, _ in batch],
                "value": [v for _, v in batch],
            }
        )
        for out in apply(("k",), iter([pdf]), state):
            for r in out.itertuples():
                closed.append(
                    (
                        int(r.grid_h.value // 1_000),
                        None if pd.isna(r.obs_value) else r.obs_value,
                        r.locf_value,
                        r.filled,
                    )
                )
    assert closed == expected


# --- BPE merge-fold equivalence ----------------------------------------------

BPE_SEP = "\x1f"


def bpe_fold(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The operator's fold (tokenize.py): wrapped-string replace per
    merge in rank order — identical str.replace semantics to the Spark
    and DuckDB forms (3-way parity pinned in test_tokenize)."""
    s = BPE_SEP + (BPE_SEP + BPE_SEP).join(word) + BPE_SEP
    for l, r in merges:
        s = s.replace(
            f"{BPE_SEP}{l}{BPE_SEP}{BPE_SEP}{r}{BPE_SEP}",
            f"{BPE_SEP}{l}{r}{BPE_SEP}",
        )
    return s.strip(BPE_SEP).split(BPE_SEP + BPE_SEP)


def bpe_min_rank_reference(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The canonical BPE apply loop (Sennrich 2016 / HF tokenizers):
    repeatedly find the LOWEST-RANK pair present anywhere in the
    sequence and merge all its occurrences left-to-right, until no
    listed pair remains."""
    ranks = {}
    for i, pair in enumerate(merges):
        ranks.setdefault(pair, i)
    seq = list(word)
    while True:
        best = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return seq
        l, r = merges[best]
        out, i = [], 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == l and seq[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out


@st.composite
def learner_shaped_merges(draw):
    """Merge lists shaped like learn_bpe_merges output: every rule's
    operands exist in the symbol vocabulary BUILT BY EARLIER rules (or
    the alphabet), and no pair repeats — the two invariants a learned
    list always satisfies (a merged-away pair cannot re-appear, and a
    new pair must involve the newest symbol, whose merges rank later).
    Sequential rank-order application is equivalent to min-rank-first
    ONLY on such lists; the generator models exactly that family."""
    symbols = ["a", "b", "c"]
    n = draw(st.integers(min_value=0, max_value=8))
    merges: list[tuple[str, str]] = []
    seen = set()
    for _ in range(n):
        l = draw(st.sampled_from(symbols))
        r = draw(st.sampled_from(symbols))
        if (l, r) in seen:
            continue
        seen.add((l, r))
        merges.append((l, r))
        if l + r not in symbols:
            symbols.append(l + r)
    return merges


class TestBpeFoldProperties:
    @given(
        word=st.text(alphabet="abc", min_size=1, max_size=12),
        merges=learner_shaped_merges(),
    )
    @settings(max_examples=300, deadline=None)
    def test_rank_order_fold_equals_min_rank_reference(self, word, merges):
        """The module docstring's equivalence claim, property-tested:
        applying learner-shaped merges sequentially in rank order (one
        replace pass each) produces exactly the canonical
        min-rank-first BPE tokenization."""
        got = bpe_fold(word, merges)
        want = bpe_min_rank_reference(word, merges)
        assert got == want, (word, merges, got, want)
        assert "".join(got) == word  # merging never alters the text

    @given(word=st.text(alphabet="ab", min_size=2, max_size=10))
    @settings(max_examples=100, deadline=None)
    def test_single_pair_pass_is_exhaustive(self, word):
        """One replace pass == merge-until-none for a single rule (the
        [a,a,a,a] -> [aa,aa] shape, generalized)."""
        got = bpe_fold(word, [("a", "a")])
        assert all(t in ("aa", "a", "b") for t in got)
        # no two adjacent 'a' singletons may remain
        for x, y in zip(got, got[1:]):
            assert not (x == "a" and y == "a"), (word, got)
