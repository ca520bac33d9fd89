#!/usr/bin/env python3
"""Fingerprint the driver testdata's parquet schemas (and row counts).

The r8 postmortem: the driver regenerated /root/testdata with a different
physical ts encoding AFTER the last recorded green, silently invalidating
the recorded gate. This prints one stable line per (sf, table) —
schema + row count — so ci.sh can diff against the fingerprint the last
recorded green actually ran against; any regeneration forces a deliberate
re-record (i.e. a re-run of the gate against the new data).

Usage: testdata_fingerprint.py [testdata_root]   # prints to stdout
"""
import hashlib
import sys
from pathlib import Path

import pyarrow.parquet as pq

root = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata")
for sf_dir in sorted(root.glob("sf*")):
    for table in sorted(sf_dir.glob("*.parquet")):
        f = pq.ParquetFile(table)
        schema_sig = hashlib.md5(
            f.schema_arrow.to_string().encode()).hexdigest()[:16]
        print(f"{sf_dir.name}/{table.name} schema={schema_sig} "
              f"rows={f.metadata.num_rows}")
