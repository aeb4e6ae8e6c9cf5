"""Descriptor extraction directly over a raw text column.

One Arrow pass fuses tokenization (protein-alphabet char filter) with the
descriptor kernel — previously two chained pandas UDFs (tokenize →
extract), i.e. two Python boundaries and one intermediate token-array
column crossing Arrow twice.  The fused plan is a single ArrowEvalPython
node over the pruned (id, text) scan; rows whose token stream is too short
for the descriptor produce all-zero vectors (the kernels' safe-division),
which downstream `freq > 0` filters drop exactly like the old pre-filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from ifeatureomega_cli_spark.functions.kernels import Ragged
from ifeatureomega_cli_spark.functions.registry import get_spec
from ifeatureomega_cli_spark.tokenize import tokenize_protein


def char_descriptor_udf(name: str, params: dict | None = None,
                        length: int = 0):
    """Fused tokenize-protein + descriptor kernel as ONE pandas UDF."""
    kern = get_spec(name).kernel(params, length)

    @pandas_udf(ArrayType(DoubleType()))
    def _udf(texts: pd.Series) -> pd.Series:
        toks = []
        for t in texts:
            ids = tokenize_protein((t or "").upper())
            toks.append(ids[ids < 20])
        r = Ragged.from_arrays(toks)
        return pd.Series(list(kern(r)))

    return _udf


def char_descriptor(
    df: DataFrame,
    name: str,
    text_col: str = "text",
    out_col: str = "features",
    params: dict | None = None,
) -> DataFrame:
    """Append `out_col array<double>` computed straight from `text_col`."""
    return df.withColumn(out_col,
                         char_descriptor_udf(name, params)(F.col(text_col)))
