"""Model registry — the Spark equivalent of Flink's ``CREATE MODEL`` DDL.

Reference declares models as typed catalog objects
(CREATE MODEL openaiembed INPUT(text STRING) OUTPUT(embedding ARRAY<FLOAT>),
 terraform/generate_personalized_commands.sh:215-223; and
 coaching_response_generator INPUT(prompt STRING) OUTPUT(coaching_response
 STRING) with provider options + system prompt, :229-259) and invokes them
with ``ML_PREDICT(model, col)`` via ``LATERAL TABLE`` (1 row in -> 1 row out,
appending the output column — :332-335, :360-361, :417-432).

Spark design: register(name, task, provider) produces an Arrow-vectorized
pandas UDF marked ``asNondeterministic()`` (so Catalyst never re-executes or
pushes filters past an expensive, side-effecting inference call — SURVEY.md
§7.4.2). ``ml_predict(df, model, col)`` is the LATERAL TABLE equivalent:
``df.withColumn(out_col, udf(col))``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ModelEntry:
    name: str
    task: str  # 'embedding' | 'text_generation'
    provider: Any
    output_col: str
    output_type: T.DataType


class ModelRegistry:
    """name -> typed invocable inference endpoint (pandas-UDF factory)."""

    def __init__(self) -> None:
        self._models: dict[str, ModelEntry] = {}

    def register_embedding(self, name: str, provider: Any, output_col: str = "embedding") -> None:
        self._models[name] = ModelEntry(
            name, "embedding", provider, output_col, T.ArrayType(T.FloatType())
        )

    def register_text_generation(
        self, name: str, provider: Any, output_col: str = "coaching_response"
    ) -> None:
        self._models[name] = ModelEntry(
            name, "text_generation", provider, output_col, T.StringType()
        )

    def get(self, name: str) -> ModelEntry:
        if name not in self._models:
            raise KeyError(f"model '{name}' not registered (CREATE MODEL equivalent missing)")
        return self._models[name]

    def udf(self, name: str):
        """Arrow-vectorized pandas UDF for the model; batches amortize
        provider round-trips (SURVEY.md §4.3.1)."""
        entry = self.get(name)
        provider = entry.provider
        task = entry.task

        if task == "embedding":

            @F.pandas_udf(T.ArrayType(T.FloatType()))
            def _embed(s: pd.Series) -> pd.Series:
                return pd.Series(provider.embed(s.tolist()))

            return _embed.asNondeterministic()

        if task == "text_generation":

            @F.pandas_udf(T.StringType())
            def _gen(s: pd.Series) -> pd.Series:
                return pd.Series(provider.generate(s.tolist()))

            return _gen.asNondeterministic()

        raise ValueError(f"unknown task {task!r}")

    def ml_predict(self, df: DataFrame, model: str, input_col: Column | str, output_col: str | None = None) -> DataFrame:
        """``LATERAL TABLE(ML_PREDICT(model, input))`` equivalent: appends the
        model output column to every row."""
        entry = self.get(model)
        out = output_col or entry.output_col
        c = F.col(input_col) if isinstance(input_col, str) else input_col
        return df.withColumn(out, self.udf(model)(c))


def default_registry(dim: int = 1536) -> ModelRegistry:
    """Registry with the reference's two models backed by the mock provider
    (hermetic default; swap providers for Azure via register_*)."""
    from flink_sql_ai_meetingcoach_azure_spark.models.providers import MockProvider  # noqa: PLC0415

    reg = ModelRegistry()
    provider = MockProvider(dim=dim)
    reg.register_embedding("openaiembed", provider)
    reg.register_text_generation("coaching_response_generator", provider)
    return reg
