#!/bin/sh
# Start the image's Postgres 15 on the local unix socket (peer auth), the
# environment the 6 COPY-loader integration tests in
# tests/test_postgres_copy.py need. The image ships the full server
# toolchain (/usr/local/bin/postgres, initdb, pg_ctl; psql 15.18) with a
# Debian split layout: data in /var/lib/postgresql/15/main, config in
# /etc/postgresql/15/main — pg_ctl must be pointed at the config file
# explicitly or startup fails with "could not access postgresql.conf".
# Discovered/verified round 10; prior rounds only probed the socket and
# recorded the sink as environment-blocked.
set -e
mkdir -p /var/run/postgresql
chown postgres:postgres /var/run/postgresql
if su postgres -c "cd /tmp && psql -At -c 'SELECT 1'" 2>/dev/null | grep -q 1; then
    echo "postgres already running"
    exit 0
fi
cd /tmp
su postgres -c "pg_ctl -D /var/lib/postgresql/15/main \
    -o '-c config_file=/etc/postgresql/15/main/postgresql.conf' \
    -l /tmp/pg.log start"
su postgres -c "cd /tmp && psql -At -c 'SELECT version()'"
