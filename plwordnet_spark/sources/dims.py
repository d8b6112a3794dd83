"""Small dimension-table sources (relation weights, rel types).

Reference: S7 XLSX relation weights (embedder.py:109-119, 589-616 reads
columns ID/name/embedder_weight_coarse) and the S8 XLSX report sink
(rel_types.py:120-260). XLSX is handled NATIVELY via the stdlib-only
reader/writer in :mod:`plwordnet_spark.sources.xlsx_lite` (openpyxl is
used when present, but is not required) — the dimension contract (tiny
table, broadcast into J1 joins) is identical across CSV/JSON/XLSX.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from plwordnet_spark.sources import xlsx_lite

__all__ = ["REL_WEIGHTS_SCHEMA", "read_relation_weights", "write_xlsx_report"]

REL_WEIGHTS_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def read_relation_weights(spark: SparkSession, path: str) -> DataFrame:
    """CSV / JSON / XLSX → broadcastable dim (no optional deps needed)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        pdf = pd.read_csv(path)
    elif ext in (".json", ".jsonl"):
        pdf = pd.read_json(path, lines=ext == ".jsonl")
    elif ext == ".xlsx":
        try:
            pdf = pd.read_excel(path)  # openpyxl when available
        except ImportError:
            header, rows = xlsx_lite.read_xlsx(path)
            pdf = pd.DataFrame(rows, columns=header)
    else:
        raise ValueError(f"unsupported dim format: {ext}")
    pdf = pdf.rename(columns={"ID": "rel_id", "embedder_weight_coarse": "weight"})
    pdf = pdf[["rel_id", "name", "weight"]]
    return spark.createDataFrame(pdf, schema=REL_WEIGHTS_SCHEMA)


def write_xlsx_report(df: DataFrame, path: str) -> None:
    """Driver-side report sink (S8 analog) — always writes real XLSX:
    pandas/openpyxl when available, the stdlib xlsx_lite writer
    otherwise. Tiny tables only (the data is collected to the driver)."""
    pdf = df.toPandas()
    try:
        pdf.to_excel(path, index=False)
    except (ImportError, ModuleNotFoundError):
        rows = [
            [None if pd.isna(v) else v for v in row]
            for row in pdf.itertuples(index=False, name=None)
        ]
        xlsx_lite.write_xlsx(path, [str(c) for c in pdf.columns], rows)
