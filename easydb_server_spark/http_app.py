"""HTTP layer — the reference's five endpoints on Flask.

Byte-compatible envelope (`src/response/schema.rs:7-69`):
success ``{"resp_msg": "successful", "resp_code": 0, "data": ...}``,
error ``{"resp_msg": msg, "resp_code": 1}`` with HTTP 400/404/422/500
(A22). Endpoints (`src/controllers.rs:270-279`):

- ``POST /fetch``      — SQL (DML limited to 200 rows, or DDL)
- ``GET  /catalog``    — non-TEMP catalog rows
- ``POST /query/export`` — uncapped download (csv/tsv/json)
- ``GET  /query/history`` — last 30 statements
- ``GET  /health``

Documented superset (no reference counterpart):

- ``POST /ingest``     — land a source as a bucketed managed table
  (`{"table", "location", "bucket_by", "n_buckets"?}`) so later
  gateway equi-joins/groupBys on the key are exchange-free
"""

from __future__ import annotations

import os

from flask import Flask, jsonify, request, send_file

from easydb_server_spark.engine import Engine
from easydb_server_spark.errors import EasyDBError


def _ok(data=None):
    body = {"resp_msg": "successful", "resp_code": 0}
    if data is not None:
        body["data"] = data
    return jsonify(body)


def create_app(engine: Engine) -> Flask:
    app = Flask("easydb_server_spark")

    @app.errorhandler(EasyDBError)
    def _handle_engine_error(e: EasyDBError):
        return jsonify({"resp_msg": e.message, "resp_code": 1}), e.status

    @app.errorhandler(Exception)
    def _handle_any(e: Exception):
        # SQL analysis failures (unknown column/table, type errors) are
        # client errors, mirroring the reference's DataFusion→400
        # mapping (`src/response/http_error.rs`); everything else is 500
        from pyspark.errors import AnalysisException, ParseException

        status = 400 if isinstance(e, (AnalysisException, ParseException)) else 500
        return jsonify({"resp_msg": str(e), "resp_code": 1}), status

    @app.post("/fetch")
    def fetch():
        body = request.get_json(silent=True) or {}
        sql = body.get("sql")
        if not sql:
            return jsonify({"resp_msg": "missing sql", "resp_code": 1}), 400
        return _ok(engine.query(sql))

    @app.get("/catalog")
    def catalog():
        return _ok(engine.catalog.list_tables())

    @app.post("/query/export")
    def export():
        body = request.get_json(silent=True) or {}
        sql = body.get("sql")
        fmt = body.get("file_type", "csv")
        if not sql:
            return jsonify({"resp_msg": "missing sql", "resp_code": 1}), 400
        # distributed=true (body or query param): executors write a
        # part-file directory — the cluster-scale sink for results too
        # big for a single download, or when executors don't share a
        # filesystem with the driver. Response is the directory path
        # instead of a file stream.
        distributed = str(
            body.get("distributed", request.args.get("distributed", ""))
        ).lower() in ("1", "true", "yes")
        path = engine.export(sql, fmt, distributed=distributed)
        if distributed:
            return _ok({"path": path})
        return send_file(
            path,
            as_attachment=True,
            download_name=os.path.basename(path),
            mimetype="application/octet-stream",
        )

    @app.post("/ingest")
    def ingest():
        # documented superset endpoint (no reference counterpart): land
        # a source file/glob as a bucketed managed table so later
        # gateway joins/groupBys on the bucket key are exchange-free
        # (Engine.ingest_bucketed; plan lock in test_ingest_bucketed.py)
        body = request.get_json(silent=True) or {}
        missing = [k for k in ("table", "location", "bucket_by") if not body.get(k)]
        if missing:
            return (
                jsonify({"resp_msg": f"missing {', '.join(missing)}", "resp_code": 1}),
                400,
            )
        out = engine.ingest_bucketed(
            body["table"],
            body["location"],
            body["bucket_by"],
            n_buckets=int(body.get("n_buckets", 16)),
        )
        return _ok(out)

    @app.get("/query/history")
    def history():
        return _ok(engine.catalog.history(limit=30))

    @app.get("/health")
    def health():
        return _ok()

    return app


def main() -> None:
    from easydb_server_spark import get_spark

    engine = Engine(get_spark("easydb-http"))
    # warm up JVM/codegen so the first real request doesn't pay ~4 s
    engine.spark.range(1000).selectExpr("sum(id)").collect()
    app = create_app(engine)
    app.run(host="0.0.0.0", port=int(os.environ.get("PORT", "8080")))


if __name__ == "__main__":
    main()
