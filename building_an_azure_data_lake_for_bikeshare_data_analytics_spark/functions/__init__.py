from .agg import exact_avg, exact_sum
from .schema import format_columns

__all__ = ["exact_avg", "exact_sum", "format_columns"]
