"""Dump .explain('formatted') for named queries to plans/r12/<q>_<tag>.txt.

Usage: python scratch/capture_plans.py TAG NAME [NAME...]
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from demo_iceberg_permanent_delete_spark.session import get_spark

tag = sys.argv[1]
names = sys.argv[2:]
spark = get_spark(app_name="plans")
spark.sparkContext.setLogLevel("ERROR")
qs = em.queries()
os.makedirs("/root/repo/plans/r12", exist_ok=True)
SF = "/root/testdata/sf0.1"

for name in names:
    df = qs[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = f"/root/repo/plans/r12/{name}_{tag}.txt"
    with open(out, "w") as f:
        f.write(buf.getvalue())
    print("wrote", out, len(buf.getvalue()), "bytes")
