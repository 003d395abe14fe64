"""Grouped-agg pandas UDFs (UDAF surface).

NOTE: deliberately no ``from __future__ import annotations`` — pandas_udf
infers the GROUPED_AGG function type from the *evaluated* annotations
(Series -> scalar), and stringified annotations break that inference.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf

from chess_lakehouse_spark._pickle import register_module_by_value

register_module_by_value(__name__)


@pandas_udf("double")
def gmean(v: pd.Series) -> float:
    """Geometric mean — exp of the mean log."""
    return float(np.exp(np.log(v.astype("float64")).mean()))
