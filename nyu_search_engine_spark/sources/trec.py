"""Raw TREC corpus ingester (SURVEY.md §2.1 S1, optional parity source).

Reference locus: inverted-index/main:parser — sequential C++ parse of
`<DOC><DOCNO>...</DOCNO><TEXT>url\\nbody</TEXT></DOC>` blocks
(/root/reference/README.md:6; TREC / MS MARCO docs format). The Spark
version is distributed: ``spark.read.text`` with a custom line delimiter
splits the stream on ``</DOC>`` so each record is one document regardless
of file-split boundaries, then column expressions extract the fields —
no per-row Python.

Output is the engine's corpus shape: repo <- docno, path <- url,
commit <- 'trec', lang <- 'und', content <- body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.option("lineSep", "</DOC>").text(path)
    doc = F.col("value")
    docno = F.regexp_extract(doc, r"(?s)<DOCNO>\s*(.*?)\s*</DOCNO>", 1)
    text = F.regexp_extract(doc, r"(?s)<TEXT>\s*(.*?)\s*(?:</TEXT>|$)", 1)
    parsed = (
        raw.filter(F.instr(doc, "<DOC") > 0)
        .select(docno.alias("docno"), text.alias("text"))
        .filter(F.col("docno") != "")
    )
    t = F.col("text")
    # the course TREC variant stores the URL as the first TEXT line
    url = F.substring_index(t, "\n", 1)
    body = F.when(
        F.instr(t, "\n") > 0, F.expr("substring(text, instr(text, '\n') + 1)")
    ).otherwise(F.lit(""))
    return parsed.select(
        F.col("docno").alias("repo"),
        url.alias("path"),
        F.lit("trec").alias("commit"),
        F.lit("und").alias("lang"),
        body.alias("content"),
    )
