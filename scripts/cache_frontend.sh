#!/bin/sh
# Cache frontend tier (parity with reference scripts/cache_frontend.sh:
# gunicorn 32 uvicorn workers; single stdlib threaded process per host
# here — scale out with one process per port behind the load balancer).
python -m sharkshark_tpu.image_server.frontend \
    --port 8086 \
    --backend "${SHARKSHARK_BACKEND:-http://127.0.0.1:8087/upscale/image}" \
    ${SHARKSHARK_REDIS_HOST:+--redis-host "$SHARKSHARK_REDIS_HOST"}
