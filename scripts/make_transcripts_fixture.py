"""Regenerate tests/fixtures/transcripts_oracle.parquet — the committed
dump of sources.transcripts.synthesize(5000, seed=42) that both the
flagship Spark query and its DuckDB oracle twin read (identical input is
what makes the hash comparison meaningful).  Rerun after ANY change to
the synthesizer, then re-run scripts/check_entry.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from cerberus_spark.sources.transcripts import synthesize

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "transcripts_oracle.parquet")

if __name__ == "__main__":
    t, _ = synthesize(5000, seed=42)
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), OUT)
    print(f"wrote {len(t)} rows -> {OUT}")
