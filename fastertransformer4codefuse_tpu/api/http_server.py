"""Minimal HTTP serving front end over CodeFuseHandler.

The reference's persistent-service story delegates to Triton
(/root/reference/src/fastertransformer/triton_backend/gptneox/
GptNeoXTritonModel.cc) — the HTTP layer lives outside its repo. Here a
stdlib ThreadingHTTPServer exposes the SAME request/response contract the
handler already speaks (the codefuse_example.py JSONL schema), so a user of
the reference's Triton deployment gets a drop-in self-contained endpoint:

  POST /predict   body = request_dict JSON (the input_demo.jsonl format)
                  -> 200 {"res": ...} on success (the handler's resultMap),
                     500 {"error": traceback} on failure
  GET  /healthz   -> 200 "ok"

Concurrency: each HTTP request runs on its own thread; with a pooled handler
(``CodeFuseHandler(pool=...)``) concurrent requests interleave mid-flight in
the continuous-batching slot pool — short requests overtake long ones.

  python -m fastertransformer4codefuse_tpu.api.cli ... --serve --http 8080
"""
from __future__ import annotations

import itertools
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_server(handler, host: str = "127.0.0.1", port: int = 8080):
    """Build (without starting) a ThreadingHTTPServer bound to the handler."""
    counter = itertools.count()  # GIL-atomic, same idiom as batcher._UIDS

    class _Req(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict | str):
            body = (
                payload if isinstance(payload, str) else json.dumps(payload)
            ).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._send(200, "\"ok\"")
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                request_dict = json.loads(self.rfile.read(n))
            except Exception as e:  # noqa: BLE001
                self._send(400, {"error": f"bad request: {e}"})
                return
            trace_id = f"http-{next(counter)}"
            code, err, result_map = handler.predict(request_dict, trace_id)
            if code != 0:
                self._send(500, {"error": err})
            else:
                self._send(200, {"res": json.loads(result_map["res"])})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), _Req)


def serve_forever(handler, host: str = "127.0.0.1", port: int = 8080):
    srv = make_server(handler, host, port)
    print(f"serving on http://{host}:{srv.server_address[1]}/predict", flush=True)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
