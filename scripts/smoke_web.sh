#!/usr/bin/env bash
# Web-API deployment smoke test (round-3 verdict item 7: "a smoke script
# that builds and curls /status").
#
# With docker available: build the image, run it, curl / and the full
# POST /run-etl -> poll /status -> GET /download flow, tear down.
# Without docker (this sandbox): launch the same server entrypoint
# (plans/serve.py — uvicorn when importable, stdlib ASGI bridge otherwise)
# as a local process and drive the identical flow.
set -euo pipefail
cd "$(dirname "$0")/.."

PORT="${SMOKE_PORT:-8123}"
BASE="http://localhost:${PORT}"

drive_flow() {
  echo "--- GET / (service descriptor / healthcheck)"
  curl -fs "${BASE}/" | python -m json.tool

  echo "--- GET /status/nonexistent (expect 404 body)"
  code=$(curl -s -o /dev/null -w '%{http_code}' "${BASE}/status/nonexistent")
  [ "$code" = 404 ] || { echo "expected 404, got $code"; exit 1; }

  echo "--- POST /run-etl (generate 500 rows, csv)"
  session=$(curl -fs -X POST "${BASE}/run-etl?rows=500&formats=csv" \
            | python -c 'import json,sys; print(json.load(sys.stdin)["session_id"])')
  echo "session: ${session}"

  echo "--- poll /status/${session}"
  for _ in $(seq 1 120); do
    status=$(curl -fs "${BASE}/status/${session}" \
             | python -c 'import json,sys; print(json.load(sys.stdin)["status"])')
    [ "$status" = completed ] && break
    [ "$status" = failed ] && { curl -fs "${BASE}/status/${session}"; exit 1; }
    sleep 1
  done
  [ "$status" = completed ] || { echo "job never completed"; exit 1; }

  echo "--- GET /download/${session}"
  curl -fs "${BASE}/download/${session}" -o /tmp/smoke_web_result.zip
  python - <<'EOF'
import zipfile
names = zipfile.ZipFile("/tmp/smoke_web_result.zip").namelist()
assert any(n.endswith(".csv") for n in names), names
assert "results_manifest.json" in names, names
print("zip contents:", names)
EOF
  echo "SMOKE OK"
}

if command -v docker >/dev/null 2>&1 && docker info >/dev/null 2>&1; then
  echo "=== docker path: build + run + curl ==="
  docker build -t laposte-etl-smoke .
  cid=$(docker run -d -p "${PORT}:8000" laposte-etl-smoke)
  trap 'docker rm -f "$cid" >/dev/null' EXIT
  for _ in $(seq 1 60); do curl -fs "${BASE}/" >/dev/null 2>&1 && break; sleep 2; done
  drive_flow
else
  echo "=== local path (no docker): plans/serve.py process ==="
  python -m laposte_data_engineering_jedha_spark.plans.serve --port "${PORT}" \
      > /tmp/smoke_web_server.log 2>&1 &
  server_pid=$!
  trap 'kill "$server_pid" 2>/dev/null || true' EXIT
  for _ in $(seq 1 60); do curl -fs "${BASE}/" >/dev/null 2>&1 && break; sleep 2; done
  drive_flow
fi
