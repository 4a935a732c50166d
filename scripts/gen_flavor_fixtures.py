"""Regenerate the committed non-Spark writer-flavor fixtures used by
SchemaFlavorSpec: unsigned-int id columns (pyarrow uint8/16/32/64 — Spark
reads uint64 as DECIMAL(20,0)) and legacy INT96 timestamps, neither of
which Spark itself can write. Source: the sf0.001 tables.

Usage: python3 scripts/gen_flavor_fixtures.py
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/flavors")
os.makedirs(OUT, exist_ok=True)

ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
ev_u = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                     ev["event_id"].cast(pa.uint64()))
ev_u = ev_u.set_column(ev_u.schema.get_field_index("user_id"), "user_id",
                       ev_u["user_id"].cast(pa.uint32()))
pq.write_table(ev_u, f"{OUT}/events_uint.parquet")

pq.write_table(ev, f"{OUT}/events_int96.parquet",
               use_deprecated_int96_timestamps=True)

na = pq.read_table("/root/testdata/sf0.001/nation.parquet")
na_u = na.set_column(na.schema.get_field_index("n_nationkey"), "n_nationkey",
                     na["n_nationkey"].cast(pa.uint8()))
na_u = na_u.set_column(na_u.schema.get_field_index("n_regionkey"), "n_regionkey",
                       na_u["n_regionkey"].cast(pa.uint16()))
pq.write_table(na_u, f"{OUT}/nation_uint.parquet")
print("fixtures written to", OUT)
