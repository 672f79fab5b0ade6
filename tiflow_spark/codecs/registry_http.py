"""Confluent-wire HTTP schema registry — local emulation + client.

Closes the last Avro scope cut: the reference talks to a Confluent (or
Glue) schema registry over HTTP (pkg/sink/codec/avro/confluent_schema_
registry.go: POST /subjects/{subject}-value/versions to register, GET
/schemas/ids/{id} to resolve — the public Confluent REST subset). This
module provides

- :class:`SchemaRegistryServer`: an in-process ``http.server`` speaking
  that REST subset, backed by the same persisted state as
  ``codecs.avro.LocalSchemaRegistry`` (idempotent re-registration, ids
  monotone per new schema text), and
- :class:`HttpSchemaRegistryClient`: a stdlib-``urllib`` client exposing
  the identical ``register / get_by_id / latest`` interface as the local
  registry — so ``encode_avro``'s 4-byte wire id can come from either
  (the wire format is registry-agnostic; the id is opaque to consumers).

Engine-side nothing changes: registry traffic is driver-side metadata
(one round-trip per schema version, exactly like the reference's cached
registry client — avro.go caches ids per table version); executors only
ever see the resolved integer id baked into the codec closure.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.request import Request, urlopen

from tiflow_spark.codecs.avro import LocalSchemaRegistry


class _Handler(BaseHTTPRequestHandler):
    registry: LocalSchemaRegistry  # set by server factory

    def log_message(self, *args):  # silence per-request stderr noise
        pass

    def _send(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header(
            "Content-Type", "application/vnd.schemaregistry.v1+json"
        )
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self) -> None:
        # POST /subjects/{subject}/versions  {"schema": "<json text>"}
        parts = self.path.strip("/").split("/")
        if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            schema_text = payload.get("schema")
            if not schema_text:
                self._send(422, {"error_code": 42201, "message": "empty schema"})
                return
            sid = self.registry.register(parts[1], schema_text)
            self._send(200, {"id": sid})
            return
        self._send(404, {"error_code": 404, "message": "not found"})

    def do_GET(self) -> None:
        parts = self.path.strip("/").split("/")
        try:
            # GET /schemas/ids/{id}
            if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                self._send(
                    200, {"schema": self.registry.get_by_id(int(parts[2]))}
                )
                return
            # GET /subjects/{subject}/versions/latest
            if (
                len(parts) == 4
                and parts[0] == "subjects"
                and parts[2] == "versions"
                and parts[3] == "latest"
            ):
                sid, text = self.registry.latest(parts[1])
                self._send(
                    200,
                    {"subject": parts[1], "id": sid, "schema": text},
                )
                return
        except KeyError:
            self._send(
                404, {"error_code": 40403, "message": "schema not found"}
            )
            return
        self._send(404, {"error_code": 404, "message": "not found"})


class SchemaRegistryServer:
    """Ephemeral-port registry server; use as a context manager."""

    def __init__(self, state_path: str):
        handler = type(
            "BoundHandler",
            (_Handler,),
            {"registry": LocalSchemaRegistry(state_path)},
        )
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self.url = f"http://127.0.0.1:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def __enter__(self) -> "SchemaRegistryServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


class HttpSchemaRegistryClient:
    """Same interface as LocalSchemaRegistry, over the Confluent REST wire.

    Resolved ids are cached per (subject, schema-text) — the one-lookup-
    per-table-version behavior of the reference's registry client."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self._cache: dict[tuple[str, str], int] = {}

    def _call(self, method: str, path: str, payload: dict | None = None):
        req = Request(
            self.base_url + path,
            method=method,
            data=json.dumps(payload).encode() if payload is not None else None,
            headers={
                "Content-Type": "application/vnd.schemaregistry.v1+json"
            },
        )
        with urlopen(req, timeout=10) as resp:
            return json.loads(resp.read())

    def register(self, subject: str, schema_text: str) -> int:
        key = (subject, schema_text)
        if key not in self._cache:
            self._cache[key] = self._call(
                "POST",
                f"/subjects/{subject}/versions",
                {"schema": schema_text},
            )["id"]
        return self._cache[key]

    def get_by_id(self, schema_id: int) -> str:
        return self._call("GET", f"/schemas/ids/{schema_id}")["schema"]

    def latest(self, subject: str) -> tuple[int, str]:
        got = self._call("GET", "/subjects/%s/versions/latest" % subject)
        return got["id"], got["schema"]
