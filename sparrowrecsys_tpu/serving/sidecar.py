"""TF-Serving-protocol scoring sidecar.

Architectural-parity mode (SURVEY.md §7 step 6): the reference scores
"nerualcf" requests over REST against TF Serving at
`http://localhost:8501/v1/models/recmodel:predict`
(`RecForYouProcess.java:139`) with the `{"instances": [{userId, movieId},
...]}` / `{"predictions": [[p], ...]}` protocol. This module exposes the
SAME protocol over our jitted `ModelScorer`, so (a) the reference's own
serving stack could point at us unchanged, and (b) our `RestScorer`
client round-trips against it in tests.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from sparrowrecsys_tpu.serving.rankers import ModelScorer


class ScoringSidecar:
    def __init__(self, scorer: ModelScorer, port: int = 8501,
                 model_name: str = "recmodel", poll_s: float = 1.0):
        self.scorer = scorer
        self.port = port
        self.path = f"/v1/models/{model_name}:predict"
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        # Hot version reload — the behavior the reference delegates to TF
        # Serving itself (version-dir polling): a new NNN/ export under the
        # scorer's model_dir is served without restarting the sidecar.
        self.watcher = None
        if poll_s > 0 and getattr(scorer, "model_dir", None):
            from sparrowrecsys_tpu.serving.rankers import ModelVersionWatcher

            self.watcher = ModelVersionWatcher({model_name: scorer}, poll_s=poll_s)

    def _make_handler(self):
        sidecar = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != sidecar.path:
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", "0"))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                    instances = body.get("instances", [])
                    preds = []
                    if instances:
                        import numpy as np

                        user_ids = [int(i.get("userId", 0)) for i in instances]
                        movie_ids = [int(i.get("movieId", 0)) for i in instances]
                        # The reference batches one user x N movies; the
                        # general case groups by user — one batched dispatch
                        # per unique user instead of one per instance
                        # (dispatch costs dominate on remote devices).
                        scores = np.empty(len(instances), np.float32)
                        by_user = {}
                        for pos, (u, m) in enumerate(zip(user_ids, movie_ids)):
                            by_user.setdefault(u, []).append((pos, m))
                        for u, items in by_user.items():
                            s = sidecar.scorer.score(u, [m for _, m in items])
                            for (pos, _), v in zip(items, s):
                                scores[pos] = v
                        preds = [[float(s)] for s in scores]
                except Exception as e:
                    # TF-Serving-style error body instead of a dropped
                    # connection (protocol parity for malformed requests).
                    err = json.dumps({"error": str(e)}).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(err)))
                    self.end_headers()
                    self.wfile.write(err)
                    return
                out = json.dumps({"predictions": preds}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, fmt, *args):
                pass

        return Handler

    def start(self) -> None:
        self._httpd = ThreadingHTTPServer(("0.0.0.0", self.port), self._make_handler())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        if self.watcher is not None:
            self.watcher.start()

    def stop(self) -> None:
        if self.watcher is not None:
            self.watcher.stop()
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
