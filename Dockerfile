# Multi-stage images for training and serving — the analog of the
# reference's dockerfile (pytorch/pytorch base + CLIP; training entrypoint
# sagemaker_train.py; inference stage running MMS). Here: a JAX TPU base,
# the moegan_tpu package, and the two entrypoints (cli.job_train for
# managed training, infer.serving for the HTTP endpoint).

FROM python:3.12-slim AS base
WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*
COPY pyproject.toml README.md ./
COPY moegan_tpu ./moegan_tpu
COPY native ./native
# TPU runtime: swap jax[tpu] for the CPU extra on non-TPU hosts.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

FROM base AS training
COPY scripts ./scripts
ENV MODEL_DIR=/opt/ml/model \
    DATA_DIR=/opt/ml/input/data \
    HYPERPARAMETERS_PATH=/opt/ml/input/config/hyperparameters.json
ENTRYPOINT ["python", "-m", "moegan_tpu.cli.job_train"]

FROM base AS inference
COPY frontend ./frontend
ENV SM_MODEL_DIR=/opt/ml/model
EXPOSE 8080
ENTRYPOINT ["python", "-m", "moegan_tpu.infer.serving", "--host", "0.0.0.0", "--port", "8080"]
