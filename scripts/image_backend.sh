#!/bin/sh
# Crash-restart supervision for the device-owning image backend
# (parity with reference scripts/image_backend.sh:1-6: gunicorn loop;
# here the stdlib threaded server via python -m).
while true; do
    python -m sharkshark_tpu.image_server.backend --port 8087 --use-cache
    echo "image backend exited ($?), restarting in 3s"
    sleep 3
done
