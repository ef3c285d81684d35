"""In-process fake OpenAI-compatible chat-completions server for tests.

The framework's test strategy (SURVEY.md §4) calls for a fake generation
endpoint so driver tests run without network. Behavior is scriptable via
``answer_fn(request_json) -> str``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional


class FakeOpenAIServer:
    def __init__(self, answer_fn: Optional[Callable[[dict], str]] = None):
        self.answer_fn = answer_fn or (lambda req: "A")
        self.requests: List[dict] = []
        self.fail_next: int = 0  # fail this many requests with 500 (retry tests)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                outer.requests.append(body)
                if outer.fail_next > 0:
                    outer.fail_next -= 1
                    self.send_response(500)
                    self.end_headers()
                    return
                content = outer.answer_fn(body)
                resp = {
                    "id": "fake",
                    "object": "chat.completion",
                    "model": body.get("model", "fake"),
                    "choices": [{
                        "index": 0,
                        "message": {"role": "assistant", "content": content},
                        "finish_reason": "stop",
                    }],
                    "usage": {"prompt_tokens": 17, "completion_tokens": 3,
                              "total_tokens": 20},
                }
                data = json.dumps(resp).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):  # silence
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @property
    def base_url(self) -> str:
        return f"http://127.0.0.1:{self._server.server_port}/v1"

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._server.shutdown()
