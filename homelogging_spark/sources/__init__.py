"""Ingestion parsers (SURVEY §2.1 S1-S11), re-expressed Spark-first.

The reference is half ingestion: each poller reads a device protocol and
parses bytes/text/JSON/XML into (series, ts, values[], tag) rows. In
this engine the *transport* (serial/UDP/HTTP polling) is out of scope —
batch/streaming sources deliver raw payload columns — and each parser
becomes a column-expression (or, for binary protocols, a pandas-UDF)
stage over those payloads:

| src | module      | payload      | strategy |
|-----|-------------|--------------|----------|
| S1  | ``ebusd``   | JSON         | ``get_json_object`` dot-paths + epoch ts + maxage gate |
| S2  | ``mbus``    | XML          | ``from_xml`` + record-id select + scale factors |
| S3  | ``dsmr``    | OBIS telegram| ``regexp_extract`` per OBIS code |
| S4  | ``goodwe``  | binary (UDP) | JVM byte-slicing for fields; CRC16 pandas UDF |
| S5  | ``sdm``     | u16 pairs    | float32 reassembly pandas UDF |
| S6  | ``weewx``   | HTML text    | regex cascade with one-level recursion |
| S7  | ``kasa``    | XOR'd JSON   | autokey decrypt pandas UDF + ``from_json`` |
| S8  | ``tapo``    | JSON         | ``get_json_object`` + ``unbase64`` nickname |
| S9  | ``vents``   | binary items | little-endian int16/bool/byte column exprs |
| S11 | ``zyco2``   | HID frames   | shuffle/XOR decrypt pandas UDF + opcode dispatch |

Scale: parsing is map-side only — it pipelines inside the scan stage,
shuffles nothing, and the regex/json built-ins stay in whole-stage
codegen. Binary UDFs are Arrow-batched. Parsed rows flow into the
``operators.ingest`` sink (dedup on (meter_id, series, ts), partitioned
append).
"""
