# Deployment image for the Spark watch/convert/analytics pipeline.
# Mirrors the reference's container packaging (its Dockerfile wraps
# the conversion tool + Airflow); here the public Spark image carries
# the runtime and the package rides on top.
FROM apache/spark:4.0.0-python3

USER root
WORKDIR /app

COPY pyproject.toml README.md ./
COPY aichemy_data_pipelines_spark ./aichemy_data_pipelines_spark
COPY __spark_entry__.py bench.py ./

# [statev2] pulls protobuf, which the State V2 streaming twin
# (transformWithStateInPandas, streaming/watch.py) needs for its
# Python worker protocol. The build sandbox this repo is developed in
# cannot pip install (no network), so tests/test_streaming.py skips
# that one twin there — in THIS image it runs.
RUN pip install --no-cache-dir ".[statev2]"

# default command: the daemon watch loop (the reference's */5 cron
# schedule); override WATCH/OUTPUT/ARCHIVE or the whole command
ENV WATCH_DIR=/data/watch \
    OUTPUT_DIR=/data/out \
    ARCHIVE_DIR=/data/archives \
    POLL_INTERVAL=300

CMD ["/bin/sh", "-c", "python -m aichemy_data_pipelines_spark.cli watch \
    --watch-dir \"$WATCH_DIR\" --output-dir \"$OUTPUT_DIR\" \
    --archive-dir \"$ARCHIVE_DIR\" --interval \"$POLL_INTERVAL\""]
