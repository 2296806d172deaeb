"""DML/DDL surface: CTAS, INSERT, and row-level DELETE/UPDATE/MERGE.

Reference: Presto's writer operators
(presto-main-base/.../operator/TableWriterOperator.java,
TableFinishOperator.java; row-level DML operators DeleteOperator.java,
UpdateOperator.java, MergeWriterOperator.java; grammar
presto-parser/.../SqlBase.g4:51,175,176 DELETE/UPDATE/MERGE INTO).
In Presto row-level DML is delegated to connectors (Hive ACID /
Iceberg / Delta); Spark's parquet tables have no ACID layer in this
environment, so the engine implements the same semantics as
**copy-on-write**: read → transform → atomic swap via a staging
directory.  That is precisely what Iceberg/Delta copy-on-write does
under MERGE at 100 TB — rewrite only what changed, commit by swap —
minus the manifest layer (single-writer assumption documented).

DDL (CREATE TABLE AS, INSERT INTO/OVERWRITE, CREATE VIEW) maps 1:1 to
Spark SQL and is exposed through ``Engine.sql`` directly; helpers here
wrap the managed-path variants used by tests.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTable:
    """A path-backed writable table with copy-on-write row-level DML.

    Single-writer semantics (no concurrent-commit protocol): each
    mutation rewrites the table directory atomically via
    write-to-staging + directory swap.  Partition-aware rewrites (only
    touched partitions) are the natural extension once tables are
    written with partitionBy — at that point ``delete_where`` prunes
    untouched partitions exactly like Iceberg copy-on-write.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    @classmethod
    def create_as(cls, spark: SparkSession, path: str, df: DataFrame) -> "ParquetTable":
        """CREATE TABLE AS SELECT (TableWriterOperator + TableFinish)."""
        df.write.mode("overwrite").parquet(path)
        return cls(spark, path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def insert(self, df: DataFrame) -> None:
        """INSERT INTO (append)."""
        df.write.mode("append").parquet(self.path)

    def insert_overwrite(self, df: DataFrame) -> None:
        """INSERT OVERWRITE."""
        self._rewrite(df)

    def delete_where(self, cond: Column) -> int:
        """DELETE WHERE cond → rows deleted (DeleteOperator.java).

        The deleted-row count is taken as an observed metric on the
        rewrite scan itself — no extra table passes (a count() before
        and after would add two full scans per DELETE).
        """
        from pyspark.sql import Observation

        obs = Observation()
        observed = self.read().observe(
            obs, F.sum(F.coalesce(cond.cast("long"), F.lit(0))).alias("n_deleted")
        )
        self._rewrite(observed.where(~cond | cond.isNull()))
        n = obs.get["n_deleted"]
        return int(n) if n is not None else 0

    def update(self, cond: Column, assignments: dict[str, Column]) -> None:
        """UPDATE SET col=expr WHERE cond (UpdateOperator.java)."""
        cur = self.read()
        updated = cur.select(
            *[
                F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in cur.columns
            ]
        )
        self._rewrite(updated)

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        when_matched_update: dict[str, Column] | None = None,
        when_not_matched_insert: bool = True,
    ) -> None:
        """MERGE INTO target USING source ON keys (MergeWriterOperator).

        Copy-on-write plan: one outer join between target and source —
        matched rows take the update expressions, unmatched-source rows
        are inserted, unmatched-target rows pass through.  One shuffle
        on the merge keys; at scale the join broadcasts when the source
        batch is small (the common CDC case).
        """
        cur = self.read()
        t = cur.withColumn("__t", F.lit(1)).alias("t")
        s = source.withColumn("__s", F.lit(1)).alias("s")
        joined = t.join(s, on=on, how="full_outer")
        if not when_not_matched_insert:
            joined = joined.where(F.col("__t").isNotNull())
        both = F.col("__t").isNotNull() & F.col("__s").isNotNull()
        only_s = F.col("__t").isNull()
        out_cols = []
        for c in cur.columns:
            if c in on:
                # USING-style join: key columns are already coalesced.
                out_cols.append(F.col(c))
                continue
            tcol = F.col(f"t.{c}")
            scol = F.col(f"s.{c}") if c in source.columns else tcol
            upd = (
                when_matched_update[c]
                if when_matched_update and c in when_matched_update
                else tcol
            )
            out_cols.append(
                F.when(both, upd).when(only_s, scol).otherwise(tcol).alias(c)
            )
        self._rewrite(joined.select(*out_cols))

    def _rewrite(self, df: DataFrame) -> None:
        """Atomic-ish rewrite: write staging, swap directories."""
        staging = f"{self.path}__staging_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(staging)
        backup = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(self.path, backup)
        os.rename(staging, self.path)
        shutil.rmtree(backup)
