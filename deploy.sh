#!/usr/bin/env bash
# Deploy script (reference `deploy.sh` analog, `/root/reference/deploy.sh`):
# load .env, create the directory structure, bring up the warehouse, wait
# for it, verify the setup, then run the application once. Two modes:
#
#   ./deploy.sh              compose mode: build the image, start the
#                            Postgres warehouse + graft containers
#                            (requires docker; the JDBC path additionally
#                            needs the public org.postgresql:postgresql
#                            driver jar on the classpath — see
#                            docker/docker-compose.yml)
#   ./deploy.sh --no-docker  local mode: same structure/verify/run steps
#                            against the parquet warehouse, no containers —
#                            the path this sandbox can execute end-to-end
set -euo pipefail

cd "$(dirname "$0")"

# Load environment variables if .env exists (reference deploy.sh:7-10)
if [ -f .env ]; then
    set -a; . ./.env; set +a
fi

echo "[deploy] graft deployment starting"

echo "[deploy] ensuring directory layout..."
for dir in "${GRAFT_INPUT:-raw_data}" "${GRAFT_OUTPUT:-output}" "${GRAFT_WAREHOUSE:-warehouse}" logs docker/init; do
    mkdir -p "$dir"
    echo "  created/verified $dir"
done

# Regenerate the warehouse bootstrap DDL from the dialect code itself so
# docker/init can never drift from what the engine executes at runtime.
echo "Generating warehouse init SQL..."
bin/graft.sh init-sql docker/init/01-init-warehouse.sql

if [ "${1:-}" = "--no-docker" ] || ! command -v docker >/dev/null 2>&1; then
    echo "Local mode: skipping containers (parquet warehouse)."
else
    echo "Starting warehouse container..."
    docker compose -f docker/docker-compose.yml down 2>/dev/null || true
    docker compose -f docker/docker-compose.yml up -d warehouse

    echo "Waiting for the warehouse to be ready..."
    max_retries=30 counter=0
    until docker exec graft_warehouse pg_isready -U "${POSTGRES_USER:-graft_user}" -d "${POSTGRES_DB:-graft_db}" >/dev/null 2>&1; do
        counter=$((counter + 1))
        if [ "$counter" -gt "$max_retries" ]; then
            echo "ERROR: warehouse failed to start in time"
            exit 1
        fi
        echo "  waiting for warehouse... ($counter/$max_retries)"
        sleep 2
    done
    echo "Warehouse is ready."
fi

echo "Verifying setup..."
if ! bin/graft.sh verify-setup "${GRAFT_TESTDATA:-/root/testdata/sf0.001}"; then
    echo "ERROR: setup verification failed."
    exit 1
fi

echo "[deploy] setup checks green — launching the pipeline..."
bin/graft.sh run \
    --user-agent "${GRAFT_USER_AGENT:-some user agent}" \
    --input "${GRAFT_INPUT:-raw_data}" \
    --output "${GRAFT_OUTPUT:-output}" \
    --warehouse "${GRAFT_WAREHOUSE:-warehouse}"
