"""Make ``google.protobuf`` importable where the wheel is absent.

Spark 4's ``transformWithStateInPandas`` Python workers speak a
protobuf state-server protocol (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``), so the feature hard-requires a
``google.protobuf`` runtime on driver AND executors. This container
forbids package installs, so the repo vendors a clean-room proto3
wire-format shim (``vendor/google/protobuf`` — written from the public
encoding spec, see its module docstring) that covers exactly the
generated module's needs.

:func:`ensure_protobuf` is the single integration point: it prefers a
real installation (the shim can never shadow one) and otherwise puts
the vendor directory on ``sys.path`` for this process and on
``PYTHONPATH`` for the Python workers Spark forks. It must run BEFORE
the SparkSession is created — workers inherit ``PYTHONPATH`` from the
driver environment at context start.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
)


def ensure_protobuf() -> str:
    """Return 'installed', 'shim', or 'missing'.

    'shim' means the vendored runtime was activated: sys.path for this
    process, PYTHONPATH for Spark's forked Python workers.
    """
    try:
        import google.protobuf  # noqa: F401

        return "installed"
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return "missing"
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + existing if existing else "")
        )
    # a partially-imported 'google' namespace package (e.g. an earlier
    # failed probe) would mask the vendor path it was created before
    google_mod = sys.modules.get("google")
    if google_mod is not None and hasattr(google_mod, "__path__"):
        if VENDOR_DIR + "/google" not in list(google_mod.__path__):
            google_mod.__path__.append(VENDOR_DIR + "/google")
    try:
        import google.protobuf  # noqa: F401

        return "shim"
    except ImportError:
        return "missing"
