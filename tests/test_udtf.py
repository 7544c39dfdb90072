"""Python UDTF surface (J-extension: the reference has no UDTFs —
SURVEY.md §2.J — but the engine ships the full modern PySpark UDF
surface: scalar pandas UDF, grouped map/agg, stateful grouped map, and
table functions with LATERAL join).

The UDTF expands each doc into word-bigram rows; correctness is asserted
against the pure-JVM explode twin, which is also the scale
recommendation (a UDTF is row-at-a-time Python — use it for logic that
genuinely needs per-row Python with multi-row output, not for what
array functions express).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from big_data_analysis_diseases_outbreaks_spark.functions.text import tokens
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


@udtf(returnType="pos: int, bigram: string")
class BigramUDTF:
    def eval(self, text: str):
        toks = text.split()
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"


def test_udtf_lateral_matches_explode_twin(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50).cache()
    docs.count()

    via_udtf = (
        docs.lateralJoin(BigramUDTF(F.col("text").outer()))
        .select("doc_id", "pos", "bigram")
    )

    toks = tokens(F.col("text"))
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, lit(0))),
        lambda x, i: F.struct(
            i.alias("pos"), F.concat_ws(" ", x, F.element_at(toks, i + 2)).alias("bigram")
        ),
    )
    via_explode = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", "g.pos", "g.bigram")
    )

    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_explode.collect()))
    assert a == b and len(a) > 0
    docs.unpersist()
