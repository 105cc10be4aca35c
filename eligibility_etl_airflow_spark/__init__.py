"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL system (see SURVEY.md).

The reference (`Andalusia-Data-Science-Team/eligibility-etl-airflow`) is an
Airflow + pandas + T-SQL claims-ETL stack; this package re-expresses every
operator it implements (SURVEY.md §2) as idiomatic Spark DataFrame / SQL
plans, plus the LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.
"""

from eligibility_etl_airflow_spark.session import get_spark
from eligibility_etl_airflow_spark.catalog import Catalog

__all__ = ["get_spark", "Catalog"]

__version__ = "0.1.0"
