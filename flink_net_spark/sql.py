"""TableEnvironment-style SQL facade — SURVEY.md §2.12.

≙ FlinkDotNet/FlinkDotNet.Table.Api/TableEnvironment.cs:
  - ``SqlQuery`` (:80-95) → ``spark.sql`` — a strict superset: the
    reference's BasicSqlParser handles single-table SELECT/WHERE/GROUP BY
    only and drops ORDER BY (:211-259); Catalyst parses full ANSI SQL.
  - ``RegisterTable/GetTable/ListTables`` (:69-108) → temp-view catalog.
  - ``FromDataStream``/``ToDataStream`` (:59-67) → a DataFrame IS both; the
    facade keeps the names so reference users find them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_net_spark.datastream import DataStream, StreamExecutionEnvironment
from flink_net_spark.session import get_spark


class TableEnvironment:
    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    @classmethod
    def create(cls, env: StreamExecutionEnvironment | None = None) -> "TableEnvironment":
        """≙ StreamTableEnvironment.Create(env)."""
        return cls(env.spark if env else None)

    # -- catalog ≙ TableEnvironment.cs:69-108 --------------------------------
    def register_table(self, name: str, table: DataFrame | DataStream) -> None:
        df = table.df if isinstance(table, DataStream) else table
        df.createOrReplaceTempView(name)

    def get_table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def list_tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    def drop_table(self, name: str) -> bool:
        return self.spark.catalog.dropTempView(name)

    # -- SQL ≙ TableEnvironment.cs:80-95 -------------------------------------
    def sql_query(self, sql: str) -> DataFrame:
        return self.spark.sql(sql)

    sql = sql_query

    # -- stream ↔ table ≙ TableEnvironment.cs:59-67 --------------------------
    def from_datastream(self, ds: DataStream, name: str | None = None) -> DataFrame:
        if name:
            ds.df.createOrReplaceTempView(name)
        return ds.df

    def to_datastream(self, table: DataFrame | str) -> DataStream:
        df = self.spark.table(table) if isinstance(table, str) else table
        return DataStream(df, StreamExecutionEnvironment(self.spark))

    def register_testdata(self, sf_dir: str) -> None:
        """Register the driver testdata tables as views (≙ the reference's
        catalog pre-population in its examples)."""
        from flink_net_spark.tables import register_views

        register_views(self.spark, sf_dir)
