"""Worked example: a web crawl in WARC form → validated, quarantined,
curated corpus — the ingestion story a Common Crawl-scale pipeline
runs, exercising the round-9 container surfaces end to end against the
bundled test data.

    python examples/crawl_to_corpus.py [sf_dir] [out_dir]

Stages (each is the 100 TB-shaped operator documented in its module):

1. CRAWL FIXTURE: the documents table is republished as multi-member
   ``.warc.gz`` shard files (``sources/warc.py warc_shard_bytes`` —
   one gzip member per record, the Common Crawl layout; bytes are
   built and written by executors, never gathered on the driver), and
   one shard is deliberately truncated to stand in for the corrupt
   fraction every real crawl carries.
2. INGESTION: ``read_warc`` — a ``binaryFile`` scan (one file = one
   task; crawl parallelism is file-count parallelism) fanned out to
   records in one Arrow pass.
3. VALIDATION + QUARANTINE: the corrupt shard must not kill the job
   OR silently vanish.  File-level: a try/except parse audit routes
   the bad file to a quarantine record with its parser's reason
   (byte offset included).  The clean records flow on.
4. MODALITY AUDIT: the same documents synthesized as mp4/mp3 payloads
   run through ``containers.audit_payload_parses`` — the row-level
   quarantine router over the container parsers (a corrupted payload
   is tagged, a compressed-codec payload is parse_ok with the seam
   recorded).
5. CURATION: the surviving records feed ``pipelines.curate_documents``
   (PII redaction → quality/language features → filters → MinHash/LSH
   near-dedup → content-hash split) — the crawl is now a training
   corpus.

Everything is deterministic (content-derived record ids, hash-keyed
decisions, no RNG state); rerunning reproduces every row and count.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark import pipelines
from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.session import get_spark
from mapreduce_framework_for_mergesort_spark.sources import containers as CT
from mapreduce_framework_for_mergesort_spark.sources import warc as W


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/msfs_crawl_demo"
    spark = get_spark(app_name="example-crawl-to-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    crawl_dir = os.path.join(out_dir, "crawl")
    os.makedirs(crawl_dir, exist_ok=True)
    for old in glob.glob(os.path.join(crawl_dir, "*.warc.gz")):
        os.remove(old)

    # 1. republish the corpus as a crawl: executor-built .warc.gz
    # shards (foreachPartition writes each task's shards; on an object
    # store the same bytes go through the store's committer)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    def write_shards(rows) -> None:
        for r in rows:
            p = os.path.join(crawl_dir, f"shard-{r['shard_id']:04d}.warc.gz")
            with open(p, "wb") as f:
                f.write(bytes(r["data"]))

    W.warc_shard_bytes(docs, n_shards=8).foreachPartition(write_shards)

    # ...and one corrupt member, because every real crawl has one
    bad_path = os.path.join(crawl_dir, "shard-corrupt.warc.gz")
    good = W.synthesize_warc([("resource", "urn:doc:corrupt", b"oops")])
    with open(bad_path, "wb") as f:
        f.write(good[:-6])  # truncated mid-terminator

    # 2+3. ingest with file-level quarantine: parse each file in a
    # try/except Arrow pass so the corrupt shard becomes a quarantine
    # ROW, not a dead job (the same loud-ValueError routing
    # audit_payload_parses does at record grain)
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(crawl_dir, "*.warc.gz"))
        .select("path", "content")
    )

    def parse_or_quarantine(batches):
        for pdf in batches:
            out = {"path": [], "ok": [], "err": [], "n_records": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    n = len(W.parse_warc(bytes(content)))
                    out["ok"].append(True)
                    out["err"].append(None)
                    out["n_records"].append(n)
                except ValueError as ex:
                    out["ok"].append(False)
                    out["err"].append(str(ex)[:200])
                    out["n_records"].append(0)
                out["path"].append(path)
            yield pd.DataFrame(out)

    audit = files.mapInPandas(
        parse_or_quarantine, "path string, ok boolean, err string, n_records int"
    )
    quarantined = audit.where(~F.col("ok")).collect()
    clean_paths = [r["path"] for r in audit.where("ok").collect()]
    print(f"crawl files: {len(clean_paths)} clean, "
          f"{len(quarantined)} quarantined")
    for r in quarantined:
        print("  quarantined:", os.path.basename(r["path"]), "--", r["err"])
    assert len(quarantined) == 1

    records = W.read_warc(spark, clean_paths[0].rsplit("/", 1)[0]
                          + "/shard-0*.warc.gz")
    recovered = records.select(
        F.split("target_uri", ":").getItem(2).cast("long").alias("doc_id"),
        F.decode(F.col("payload"), "utf-8").alias("text"),
    )
    n_rec = recovered.count()
    print(f"records ingested from clean shards: {n_rec} (source {n_docs})")
    assert n_rec == n_docs

    # 4. row-level modality audit over the same docs as mp4/mp3
    binarized = CT.binarize_mp4_documents(docs.limit(200)).unionByName(
        CT.binarize_mp3_documents(docs.limit(200))
    )
    counts = (
        CT.audit_payload_parses(binarized)
        .groupBy("modality", "parse_ok")
        .count()
        .collect()
    )
    print("modality parse audit:",
          sorted((r["modality"], r["parse_ok"], r["count"]) for r in counts))

    # 5. curate the recovered crawl into a training corpus
    curated = pipelines.curate_documents(recovered)
    per_split = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    print("curated corpus:", json.dumps(per_split, sort_keys=True),
          f"({sum(per_split.values())} docs from {n_rec} crawl records)")


if __name__ == "__main__":
    main()
