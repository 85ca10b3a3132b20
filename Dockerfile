# Container for riptrm_tpu (parity with the reference's Dockerfile, which
# ships a python:3 + pip environment; /root/reference/Dockerfile:1-18).
# For TPU runs use a TPU-enabled base image and `pip install jax[tpu]`.
FROM python:3.12

WORKDIR /app
COPY pyproject.toml ./
RUN pip install --no-cache-dir "jax[cpu]" numpy pyyaml pandas matplotlib seaborn pytest wandb
COPY . .

CMD ["/bin/bash"]
