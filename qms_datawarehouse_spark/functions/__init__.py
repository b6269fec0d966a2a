from qms_datawarehouse_spark.functions.scalars import duration_m_s, sorted_set_str

__all__ = ["duration_m_s", "sorted_set_str"]
