"""Fresh-process 50-key oracle drive (driver simulation).

Runs every registered query at sf0.01 on a VANILLA local[32] session and
value-compares against its DuckDB oracle via tests/oracle.compare_query.
Prints one line per key and a final `BAD: [...]` summary line.
"""
import sys, time, traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("drive50")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)

import __spark_entry__ as e
from oracle import compare_query

SF = "/root/testdata/sf0.01"
qs = e.queries()
os_ = e.oracle_sql()
bad = []
t0 = time.time()
for name in sorted(qs):
    t = time.time()
    try:
        if name in os_:
            compare_query(spark, name, SF, qs, os_)
            print(f"OK   {name} ({time.time()-t:.1f}s)", flush=True)
        else:
            n = qs[name](spark, SF).count()
            print(f"ROWS {name} n={n} ({time.time()-t:.1f}s)", flush=True)
    except Exception as ex:
        bad.append(name)
        print(f"FAIL {name}: {ex}", flush=True)
        traceback.print_exc()
print(f"TOTAL {time.time()-t0:.0f}s over {len(qs)} keys", flush=True)
print("BAD:", bad, flush=True)
