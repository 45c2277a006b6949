"""CSV memoization cache — the reference's exact-match response cache.

Reference: app/utils/cache_utils.py (CSV at app/data/cached.csv, header
['Message','Response','Reasoning','Used Excerpts','RAG sources'], :47;
load/add/delete :32-191), consulted before the pipeline
(app/routes/api_routes.py:34-39) to short-circuit inference.

Spark design: the cache is a small batch DataFrame; the pipeline does a
broadcast LEFT JOIN against it and only cache-miss rows proceed to the
inference stages (P7). The CSV read/write itself is Spark-native so the same
code works against a distributed store path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.schemas import CACHED_RESPONSES


class ResponseCache:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        try:
            df = (
                self.spark.read.option("header", "true")
                .schema(CACHED_RESPONSES)
                .csv(self.path)
            )
            _ = df.head(1)
            return df
        except Exception:
            return self.spark.createDataFrame([], CACHED_RESPONSES)

    def save(self, df: DataFrame) -> None:
        df.coalesce(1).write.mode("overwrite").option("header", "true").csv(self.path)

    def add(self, message: str, response: str, reasoning: str = "", used_excerpts: str = "", rag_sources: str = "") -> None:
        # materialize the current rows BEFORE overwriting: save() rewrites the
        # path a lazy load() plan would still be reading from (self-overwrite
        # -> FAILED_READ_FILE). The cache is small by contract (human-curated
        # golden set), so a driver-side collect is the correct trade.
        existing = [
            tuple(r) for r in self.load().filter(F.col("Message") != message).collect()
        ]
        rows = existing + [(message, response, reasoning, used_excerpts, rag_sources)]
        self.save(self.spark.createDataFrame(rows, CACHED_RESPONSES))

    def lookup_join(self, messages: DataFrame, message_col: str = "message") -> DataFrame:
        """Broadcast left join: appends cache columns; null Response = miss."""
        cache = self.load().withColumnRenamed("Message", "__cache_key")
        return messages.join(
            F.broadcast(cache),
            messages[message_col] == F.col("__cache_key"),
            "left",
        ).drop("__cache_key")

    def sorted_questions(self) -> DataFrame:
        """Alphabetical question list for the UI (reference: cache_utils.py:249)."""
        return self.load().select(F.col("Message").alias("question")).orderBy("question")
