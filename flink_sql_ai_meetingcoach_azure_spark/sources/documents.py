"""Document corpus sources.

Reference ingestion path (SURVEY.md §3.1): markdown files under
``sample-data/knowledge_base_markdown/**`` become
``{document_id: relpath, document_name: basename, document_category:
parent_dir, document_text: content}`` records
(sample-data/process_md_to_json.py:51-56), then are published to the
``knowledge`` topic (terraform/publish_knowledge_documents.py:177-205).

Spark-first: one ``spark.read.text(wholetext)`` scan + ``input_file_name()``
+ regexp metadata extraction — no driver-side file walking, so the loader
scales to millions of files (Spark lists and partitions the file set)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_markdown_corpus(
    spark: SparkSession, root: str, glob: str = "*/*.md"
) -> DataFrame:
    """Load a markdown tree into the ``knowledge`` schema (FIXTURES.md §1).

    ``document_id`` is the path relative to ``root`` (category/file.md),
    ``document_category`` its parent directory — same derivation as the
    reference's md→JSON preprocessor.
    """
    root = root.rstrip("/")
    # NB: must be the text() kwarg — a prior .option("wholetext", ...) is
    # ignored by DataFrameReader.text, silently yielding one row per LINE
    df = spark.read.text(f"{root}/{glob}", wholetext=True).withColumn(
        "__path", F.input_file_name()
    )
    # document_id = last two path segments (category/file.md), scheme-agnostic
    parts = F.split(F.col("__path"), "/")
    name = F.element_at(parts, -1)
    category = F.element_at(parts, -2)
    return df.select(
        F.concat_ws("/", category, name).alias("document_id"),
        name.alias("document_name"),
        category.alias("document_category"),
        F.col("value").alias("document_text"),
    )
