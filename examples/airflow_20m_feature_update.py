"""Airflow DAG example: daily FP3 feature refresh via spark-submit.

Mirrors the reference's scheduler glue (`airflow/dags/
20m_feature_update.py:18-42`, which `flink run`-submits
`feature_batch_update.py --processingDate '{{ ds }}'` at 00:10 daily)
for the Spark engine: the same daily cadence, the same logical-date
parameter, with `spark-submit` in place of `flink run`.

The wrapped job (`jobs/feature_batch_job.py`) is idempotent — the
write is a keyed MERGE on (uuid, window_end) — so Airflow retries and
`airflow dags backfill` reruns converge to the same table; `catchup`
can safely be enabled for historical backfill.

Not imported by the package or tests (Airflow isn't in this
container); drop the file into any Airflow 2.4+ dags/ folder (the
`schedule=` DAG kwarg is 2.4+; on 2.0-2.3 use `schedule_interval=`).
A plain cron equivalent of the same contract:

    10 0 * * * spark-submit --master yarn --deploy-mode cluster \
        --py-files engine.zip \
        kafka_flink_streaming_pipeline_spark/jobs/feature_batch_job.py \
        --processing-date "$(date -d yesterday +\\%F)" \
        --sf-dir s3://bucket/events --out s3://bucket/features_20m
"""

from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.bash import BashOperator

default_args = {
    "depends_on_past": False,
    "email_on_failure": False,
    "email_on_retry": False,
    "retries": 1,
    "retry_delay": timedelta(minutes=2),
}

with DAG(
    dag_id="20m_feature_update_spark",
    start_date=datetime(2025, 8, 1),
    schedule="10 0 * * *",  # daily at 00:10, like the reference DAG
    catchup=False,
    default_args=default_args,
) as dag:
    submit = BashOperator(
        task_id="spark_submit_feature_batch",
        bash_command=(
            "spark-submit --master {{ var.value.get('spark_master', 'local[*]') }} "
            "--conf spark.sql.adaptive.enabled=true "
            "--conf spark.sql.session.timeZone=UTC "
            "--py-files {{ var.value.engine_zip }} "
            "{{ var.value.repo_dir }}/kafka_flink_streaming_pipeline_spark"
            "/jobs/feature_batch_job.py "
            "--processing-date '{{ ds }}' "
            "--sf-dir {{ var.value.events_dir }} "
            "--out {{ var.value.features_out_dir }}"
        ),
    )
