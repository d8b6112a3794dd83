"""Small dimension-table sources (relation weights, rel types).

Reference: S7 XLSX relation weights (embedder.py:109-119, 589-616 reads
columns ID/name/embedder_weight_coarse) and the S8 XLSX report sink
(rel_types.py:120-260). XLSX needs openpyxl, which this container lacks,
so the loader accepts CSV/JSON natively and gates the XLSX path behind
an import-try — the dimension contract (tiny table, broadcast into J1
joins) is identical either way.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["REL_WEIGHTS_SCHEMA", "read_relation_weights", "write_xlsx_report"]

REL_WEIGHTS_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def read_relation_weights(spark: SparkSession, path: str) -> DataFrame:
    """CSV / JSON / XLSX (if openpyxl present) → broadcastable dim."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        pdf = pd.read_csv(path)
    elif ext in (".json", ".jsonl"):
        pdf = pd.read_json(path, lines=ext == ".jsonl")
    elif ext == ".xlsx":
        try:
            pdf = pd.read_excel(path)  # needs openpyxl
        except ImportError as exc:
            raise NotImplementedError(
                "XLSX weights need openpyxl (not in this container); "
                "provide CSV/JSON with columns rel_id,name,weight"
            ) from exc
    else:
        raise ValueError(f"unsupported dim format: {ext}")
    pdf = pdf.rename(columns={"ID": "rel_id", "embedder_weight_coarse": "weight"})
    pdf = pdf[["rel_id", "name", "weight"]]
    return spark.createDataFrame(pdf, schema=REL_WEIGHTS_SCHEMA)


def write_xlsx_report(df: DataFrame, path: str) -> None:
    """Driver-side cosmetic report sink (S8 analog); CSV fallback when
    openpyxl is absent — the data is identical."""
    pdf = df.toPandas()
    try:
        pdf.to_excel(path, index=False)
    except (ImportError, ModuleNotFoundError):
        pdf.to_csv(os.path.splitext(path)[0] + ".csv", index=False)
