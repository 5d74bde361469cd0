"""Output sinks (S8 in SURVEY.md §2.1).

The reference emits a sorted, headered, tab-separated, gzipped TSV
(steps/output.sh:113-128). write_importance_tsv reproduces that artifact for
tests/small outputs; at scale the durable artifact is the partitioned-parquet
catalog table (sources/catalog.py) and the TSV is a final coalesce(1) export
outside the hot path.
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_importance_tsv(wmi: DataFrame, out_path: str) -> str:
    """Sorted single-file TSV (gzip): ORDER BY language-size DESC, type, title
    with header — byte-compatible shape with the reference's output."""
    top = wmi.groupBy("language").agg(F.count(F.lit(1)).alias("size"))
    ordered = (
        wmi.join(F.broadcast(top), "language")
        .orderBy(F.desc("size"), "type", "title")
        .select("language", "type", "title", "importance", "wikidata_id")
    )
    tmp = out_path + ".tmpdir"
    (
        ordered.coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("compression", "gzip")
        .option("emptyValue", "")
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv.gz"))[0]
    shutil.move(part, out_path)
    shutil.rmtree(tmp)
    os.chmod(out_path, 0o644)  # steps/output.sh:128
    return out_path


def read_importance_tsv(path: str) -> list[list[str]]:
    with gzip.open(path, "rt") as f:
        return [line.rstrip("\n").split("\t") for line in f]
