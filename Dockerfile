# Runtime image (reference-parity: .docker/Dockerfile builds Ubuntu 22.04
# + GiNaC + CPLEX for the C++ stack; here the stack is JAX, so the image
# is just Python + jax[tpu] + the native QP oracle).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/mpc-cbf-tpu
COPY . .

# TPU wheel on a TPU VM; swap for "jax[cpu]" elsewhere
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    numpy scipy matplotlib pytest

RUN make -C native

ENV PYTHONPATH=/opt/mpc-cbf-tpu
CMD ["python", "-m", "pytest", "tests/", "-q"]
