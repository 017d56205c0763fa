# Service container (reference: rag/Dockerfile — python-slim + uvicorn;
# here the stack is jax + the stdlib HTTP server, with g++ for the native
# analyzer). For TPU hosts, base on a jax[tpu] image instead.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY intool_rag_tpu/ intool_rag_tpu/
# pre-build the native analyzer at image build time
RUN python -c "from intool_rag_tpu.native import native_available; assert native_available()"

RUN useradd -m svc && mkdir -p /storage && chown -R svc /app /storage
USER svc
ENV STORAGE_DIR=/storage
EXPOSE 8001
CMD ["python", "-m", "intool_rag_tpu.service", "--port", "8001"]
