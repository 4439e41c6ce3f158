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

if [ "${1:-}" = "--no-docker" ] || ! command -v docker >/dev/null 2>&1; then
    # ---- local mode: verify + run directly on this host ----
    echo "[deploy] local mode: no containers (parquet warehouse)"

    # Regenerate the warehouse bootstrap DDL from the dialect code itself so
    # docker/init can never drift from what the engine executes at runtime.
    # (Host generation is fine here: this branch runs the pipeline on the
    # host, so the Spark jars the launcher needs are present anyway.)
    echo "Generating warehouse init SQL..."
    bin/graft.sh init-sql docker/init/01-init-warehouse.sql

    echo "[deploy] verifying setup..."
    TESTDATA="${GRAFT_TESTDATA:-/root/testdata/sf0.001}"
    if [ -d "$TESTDATA" ]; then VERIFY_ARG="$TESTDATA"; else VERIFY_ARG="--skip-testdata"; fi
    if ! bin/graft.sh verify-setup "$VERIFY_ARG"; then
        echo "[deploy] ERROR: setup verification failed." >&2
        exit 1
    fi

    echo "[deploy] setup checks green — launching the pipeline..."
    bin/graft.sh run \
        --user-agent "${GRAFT_USER_AGENT:-some user agent}" \
        --input "${GRAFT_INPUT:-raw_data}" \
        --output "${GRAFT_OUTPUT:-output}" \
        --warehouse "${GRAFT_WAREHOUSE:-warehouse}"
else
    # ---- compose mode: everything runs in containers ----
    # always (re)build the jar for the image — sbt package is incremental,
    # and skipping it when ANY jar exists would bake a stale version in
    if command -v sbt >/dev/null 2>&1; then
        echo "[deploy] building the library jar for the image..."
        bin/graft.sh build
    elif ! ls target/scala-2.13/data_engineering_projectspark_*.jar >/dev/null 2>&1; then
        echo "[deploy] ERROR: no library jar and no sbt to build one" >&2
        exit 1
    fi

    echo "[deploy] building the graft image + starting the warehouse..."
    docker compose -f docker/docker-compose.yml down 2>/dev/null || true
    docker compose -f docker/docker-compose.yml build graft

    # Regenerate the warehouse bootstrap DDL from the dialect code itself so
    # docker/init can never drift from what the engine executes at runtime.
    # Generated INSIDE the just-built image (init-sql - prints bare SQL on
    # stdout): a docker-only host has no /opt/spark/jars, so running the
    # launcher on the host would hard-error here. --no-deps: the generator
    # must not wait on (or boot) the warehouse it is generating DDL for.
    echo "Generating warehouse init SQL (inside the image)..."
    docker compose -f docker/docker-compose.yml run --rm --no-deps \
        --entrypoint bin/graft.sh graft init-sql - > docker/init/01-init-warehouse.sql

    docker compose -f docker/docker-compose.yml up -d warehouse

    echo "[deploy] waiting for the warehouse..."
    max_retries=30 counter=0
    until docker exec graft_warehouse pg_isready -U "${POSTGRES_USER:-graft_user}" -d "${POSTGRES_DB:-graft_db}" >/dev/null 2>&1; do
        counter=$((counter + 1))
        if [ "$counter" -gt "$max_retries" ]; then
            echo "[deploy] ERROR: warehouse failed to start in time" >&2
            exit 1
        fi
        echo "  waiting for warehouse... ($counter/$max_retries)"
        sleep 2
    done
    echo "[deploy] warehouse is ready"

    # the container's entrypoint runs the verify -> run-once -> cron-loop
    # sequence itself; deploy just starts it and reports where the logs are
    echo "[deploy] starting the graft service..."
    docker compose -f docker/docker-compose.yml up -d graft
    echo "[deploy] graft service started — follow with: docker logs -f graft_app"
fi
