# The reference DAG (/root/reference/airflow/dags/weather_etl.py) re-expressed
# for the Spark engine: same id-for-id scheduling envelope — 2-minute
# schedule, retries=1 with a 5-minute delay, no catchup — but each task
# submits the Spark job (graft.pipeline.WeatherEtlMain) instead of running
# Python/MySQL inline.
#
# Task mapping (reference task ids -> here):
#   create_database_and_user + create_table  -> ensure_catalog
#       (one idempotent `--stage ddl` submit; Spark's catalog has no
#        user/grant step — credentials live in the JDBC sink options)
#   extract_weather_data >> transform_weather_data >> load_weather_data
#                                            -> run_etl
#       (one `--stage run` submit: the reference's XCom hand-offs between
#        these three tasks are lazy plan composition inside the engine —
#        splitting them into three spark-submits would materialize the
#        one-row intermediates the reference's design never needed)
#
# Retries are SAFE on run_etl because the load is an idempotent
# (city, utc)-keyed dedup-append (weather_etl.py's WHERE-NOT-EXISTS insert,
# O13) — a retried run re-fetches and appends nothing it already landed.
#
# This file is deployment skin: it needs an Airflow runtime with the
# apache-airflow-providers-apache-spark provider, neither of which runs in
# the offline build container. It is exercised there only by the DAG
# structure check in WeatherEtlJobSpec.

from datetime import datetime, timedelta
import os

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

# Same default_args as the reference (weather_etl.py:15-22)
default_args = {
    "owner": "airflow",
    "depends_on_past": False,
    "email_on_failure": False,
    "email_on_retry": False,
    "retries": 1,
    "retry_delay": timedelta(minutes=5),
}

JAR = os.getenv("GRAFT_JAR", "/opt/graft/weather-etl-assembly.jar")
TABLE = os.getenv("WEATHER_TABLE_PATH", "/data/weather")

dag = DAG(
    "weather_etl_spark",
    default_args=default_args,
    description="ETL Spark: extraire, transformer et charger des données météorologiques",
    schedule_interval=timedelta(minutes=2),  # weather_etl.py:29
    start_date=datetime(2024, 8, 7),
    catchup=False,
)

ensure_catalog = SparkSubmitOperator(
    task_id="ensure_catalog",
    application=JAR,
    java_class="graft.pipeline.WeatherEtlMain",
    application_args=["--table", TABLE, "--stage", "ddl"],
    conn_id="spark_default",
    dag=dag,
)

run_etl = SparkSubmitOperator(
    task_id="run_etl",
    application=JAR,
    java_class="graft.pipeline.WeatherEtlMain",
    application_args=["--table", TABLE],
    conn_id="spark_default",
    # CITY/LANG/UNITS/API_KEY flow to the driver env exactly as the
    # reference reads them (weather_etl.py:93-96). Only keys that are SET
    # are forwarded: defaulting an unset var to "" would turn the engine's
    # fail-fast "configuration manquante" error into an opaque HTTP 401
    # (presence-but-empty passes the env check).
    env_vars={
        k: os.environ[k]
        for k in ("CITY", "LANG", "UNITS", "API_KEY")
        if k in os.environ
    },
    dag=dag,
)

ensure_catalog >> run_etl  # weather_etl.py:228
