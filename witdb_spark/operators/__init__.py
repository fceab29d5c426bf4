"""Custom operator compositions for semantics Spark lacks natively
(SURVEY.md §7 hard parts), each built from existing DataFrame ops so
Catalyst still plans/distributes them."""

from witdb_spark.operators.match_recognize import match_recognize
from witdb_spark.operators.qdigest import merge_qdigests, qdigest_agg, values_at_quantiles
from witdb_spark.operators.skew import salted_agg, salted_count_distinct
from witdb_spark.operators.table_functions import exclude_columns, sequence_table
from witdb_spark.operators.window_ext import groups_frame_sum

__all__ = [
    "exclude_columns",
    "groups_frame_sum",
    "match_recognize",
    "merge_qdigests",
    "qdigest_agg",
    "values_at_quantiles",
    "salted_agg",
    "salted_count_distinct",
    "sequence_table",
]
