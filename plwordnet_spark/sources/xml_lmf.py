"""XML-LMF source: WordNet-LMF-style lexical entries from XML payloads.

Reference: S9 (SURVEY.md §2.1) — en_wordnet.py:166-229 parses English
WordNet LexicalEntry/Synset elements with ElementTree on the driver.
Here the XML documents arrive as a DataFrame column (one document per
row — the pattern for a distributed dump split into per-file rows) and
are parsed executor-side in an Arrow-batched pandas UDF using stdlib
ElementTree; entity unescaping (T10, en_wordnet.py:281-304) is handled
by the XML parser itself.

Expected element shape (WordNet-LMF, public spec)::

    <LexicalEntry id="...">
      <Lemma writtenForm="..." partOfSpeech="n"/>
      <Sense id="..." synset="..."/>
    </LexicalEntry>
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["LMF_ENTRY_SCHEMA", "parse_lmf_entries"]

LMF_ENTRY_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("entry_id", T.StringType(), True),
            T.StructField("written_form", T.StringType(), True),
            T.StructField("pos", T.StringType(), True),
            T.StructField("sense_id", T.StringType(), True),
            T.StructField("synset_id", T.StringType(), True),
        ]
    )
)


def _parse_one(xml_text: str) -> list[dict]:
    if not xml_text or not xml_text.strip():
        return []
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    out = []
    for entry in root.iter("LexicalEntry"):
        lemma = entry.find("Lemma")
        written = lemma.get("writtenForm") if lemma is not None else None
        pos = lemma.get("partOfSpeech") if lemma is not None else None
        senses = entry.findall("Sense") or [None]
        for sense in senses:
            out.append(
                {
                    "entry_id": entry.get("id"),
                    "written_form": written,
                    "pos": pos,
                    "sense_id": sense.get("id") if sense is not None else None,
                    "synset_id": sense.get("synset") if sense is not None else None,
                }
            )
    return out


@F.pandas_udf(LMF_ENTRY_SCHEMA)
def _parse_lmf_udf(xml_col: pd.Series) -> pd.Series:
    return xml_col.map(lambda x: _parse_one(x or ""))


def parse_lmf_entries(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """df(…, xml) → one row per (entry, sense): entry_id, written_form,
    pos, sense_id, synset_id."""
    return (
        df.select(F.explode(_parse_lmf_udf(F.col(xml_col))).alias("e"))
        .select("e.*")
    )
