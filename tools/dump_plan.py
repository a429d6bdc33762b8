"""Dump .explain('formatted') for catalog queries to plans/<dir>/.

Usage: python tools/dump_plan.py <out_dir_suffix> <query> [<query> ...]
e.g.   python tools/dump_plan.py after q42_ann_lsh_recall

Writes plans/r10/<query>_<suffix>.txt at sf0.1 (plan shape only — no
action is executed unless the query function itself materializes).
"""
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as m

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    os.makedirs("plans/r10", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = f"plans/r10/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path, len(buf.getvalue().splitlines()), "lines")


if __name__ == "__main__":
    main()
