# CPU image (reference ships Dockerfile/Dockerfile.gpu for TF 1.3;
# /root/reference/Dockerfile:1). For TPU runtimes use a jax[tpu] base.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY graphsage_tpu ./graphsage_tpu
COPY native ./native
COPY examples ./examples
COPY example_supervised.sh example_unsupervised.sh ./

RUN pip install --no-cache-dir "jax[cpu]" optax orbax-checkpoint \
    scikit-learn && pip install --no-cache-dir -e . \
    && make -C native

ENTRYPOINT ["python", "-m", "graphsage_tpu.cli"]
