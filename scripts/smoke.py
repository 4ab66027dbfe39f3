"""Quick iteration smoke: flat transcripts rule-set end-to-end."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import datetime as dt

from pyspark.sql import SparkSession, functions as F

from cerberus_spark import SparkValidator

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

rows = [
    ("c-00000000000a", 0, "system", "hello world", None, dt.datetime(2024, 1, 1)),
    ("c-00000000000a", 1, "user", "hi", "hammer", dt.datetime(2024, 1, 1, 0, 1)),
    ("c-00000000000a", 2, "assistant", "", "search", dt.datetime(2024, 1, 1, 0, 2)),
    ("BAD-ID", -1, "bogus", None, None, dt.datetime(2024, 1, 1)),
]
df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")

turn_schema = {
    "conv_id": {"type": "string", "required": True, "empty": False, "regex": r"c-[0-9a-f]{12}"},
    "turn_idx": {"type": "integer", "required": True, "min": 0, "max": 100000},
    "role": {"type": "string", "required": True, "allowed": ["system", "user", "assistant", "tool"]},
    "text": {"type": "string", "required": True, "nullable": False, "maxlength": 100000},
    "tool": {"type": "string", "nullable": True, "dependencies": {"role": ["assistant", "tool"]}},
    "ts": {"type": "datetime", "required": True},
}

v = SparkValidator(turn_schema, key_cols=("conv_id", "turn_idx"))
res = v.validate(df)
res.annotated.show(truncate=120)
res.violations_sorted().show(50, truncate=60)
print("counts:", res.counts())
res.annotated.explain("formatted")
