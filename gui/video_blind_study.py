#!/usr/bin/env python
"""Video blind study server (reference gui/video_blind_study.py, 2096 LoC).

Complete four-mode study app over the per-method benchmark videos
(reference modes learn/compare/quiz/results, video_blind_study.py:99-1783):

- **learn**: labeled playback of each method's video with its metrics;
- **compare**: two synchronized players, any two methods side by side;
- **quiz**: an unlabeled random method video; the participant names the
  method; running score; results persisted;
- **results**: experiment-results table (quality suffixes stripped) plus
  the session's quiz record.

HTTP surface (reference video_blind_study.py:1781-2055):
    GET  /                        the study UI
    GET  /api/metadata            clips_metadata.json contents
    GET  /api/experiment-results  experiment results (suffixes stripped)
    GET  /api/video/<model>       video bytes with HTTP Range support (206)
    GET  /api/available-clips     clips with benchmark videos
    POST /api/switch-clip         change active clip
    POST /api/reprocess           launch background re-benchmark (409 busy)
    GET  /api/processing-status   background progress
    POST /api/new-interval        fast re-cut of pre-generated full videos
                                  (benchmark_proper.extract_clip), fallback
                                  to regeneration (reference :1934-1985)
    POST /api/quiz/start          begin a quiz round (server picks method)
    GET  /api/quiz/video          stream the secret round's video
    POST /api/quiz/guess          submit a guess -> reveal + score
    POST /api/quiz/save           persist session results

Range-request streaming (reference :1832-1886) is implemented directly on
the stdlib server; the background re-benchmark runs gui/benchmark_proper.py
in a thread with parsed progress, guarded by a single processing_state dict
(reference :1915-1931).
"""

from __future__ import annotations

import json
import random
import re
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHUNK = 1 << 20

HTML_PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Video Blind Study</title>
<style>
 body{background:#14161a;color:#e8e8e8;font-family:system-ui,sans-serif;
      margin:0;padding:1rem;max-width:1500px;margin:auto}
 h1{font-size:1.25rem}
 nav button{background:#22262c;color:#dfe3e8;border:0;border-radius:6px;
      padding:.5rem 1rem;margin-right:.4rem;cursor:pointer;font-size:.95rem}
 nav button.active{background:#2d6cdf;color:#fff}
 select,button.act{background:#2d6cdf;color:#fff;border:0;border-radius:6px;
      padding:.45rem .9rem;margin:.2rem;font-size:.95rem;cursor:pointer}
 select{background:#22262c}
 video{width:100%;border-radius:8px;background:#000}
 .row{display:flex;gap:.8rem}.col{flex:1}
 .muted{color:#9aa0a8}.ok{color:#4fc26b}.bad{color:#e05d5d}
 table{border-collapse:collapse;margin-top:.6rem}
 td,th{border:1px solid #2a2e34;padding:.3rem .7rem;text-align:left;font-size:.9rem}
 #quizFeedback{font-weight:600;min-height:1.4rem}
 .pill{display:inline-block;background:#22262c;border-radius:999px;
       padding:.15rem .7rem;margin-left:.5rem;font-size:.9rem}
</style></head><body>
<h1>Gaming VFI+SR video study
 <span class="pill" id="clipPill"></span>
 <span class="pill" id="scorePill" hidden></span></h1>
<nav>
 <button id="nav-learn" onclick="mode('learn')">Learn</button>
 <button id="nav-compare" onclick="mode('compare')">Compare</button>
 <button id="nav-quiz" onclick="mode('quiz')">Quiz</button>
 <button id="nav-results" onclick="mode('results')">Results</button>
 <button class="act" onclick="newInterval()" style="float:right">New interval ⟳</button>
</nav>
<div id="learn" class="pane">
 <p><select id="learnSel" onchange="loadLearn()"></select>
    <span class="muted" id="learnMetrics"></span></p>
 <video id="learnVid" controls loop></video>
</div>
<div id="compare" class="pane" hidden>
 <div class="row">
  <div class="col"><select id="cmpA" onchange="loadCmp()"></select>
    <video id="vidA" controls loop muted></video></div>
  <div class="col"><select id="cmpB" onchange="loadCmp()"></select>
    <video id="vidB" controls loop muted></video></div>
 </div>
 <button class="act" onclick="syncPlay()">▶ Play both</button>
</div>
<div id="quiz" class="pane" hidden>
 <p class="muted">Which method produced this video?</p>
 <video id="quizVid" controls loop muted></video>
 <div id="quizBtns"></div>
 <div id="quizFeedback"></div>
 <button class="act" onclick="quizStart()">Next round</button>
 <button class="act" onclick="quizSave()">Save session</button>
 <span id="quizSaveMsg" class="muted"></span>
</div>
<div id="results" class="pane" hidden>
 <h3>Experiment results</h3><div id="resultsBody" class="muted">loading…</div>
</div>
<script>
let models=[],score=0,total=0,quizToken=null;
const $=id=>document.getElementById(id);
async function j(u,o){const r=await fetch(u,o);return r.json()}
function mode(m){
 for(const p of document.querySelectorAll('.pane'))p.hidden=true;
 for(const b of document.querySelectorAll('nav button'))b.classList.remove('active');
 $(m).hidden=false;const nb=$('nav-'+m);if(nb)nb.classList.add('active');
 if(m==='results')loadResults();
 if(m==='quiz'&&!quizToken)quizStart();
}
async function init(){
 const meta=await j('/api/metadata');
 const clips=Object.keys(meta.clips||{});
 $('clipPill').textContent=clips.length?clips[0]:'no clips — run gui/benchmark_proper.py';
 const clip=clips[0];
 models=clip?Object.keys(meta.clips[clip].videos||{}):[];
 window.metrics=clip?(meta.clips[clip].metrics||{}):{};
 const opts=models.map(m=>`<option>${m}</option>`).join('');
 $('learnSel').innerHTML=opts;$('cmpA').innerHTML=opts;$('cmpB').innerHTML=opts;
 if(models.length>1)$('cmpB').selectedIndex=1;
 $('quizBtns').innerHTML=models.map(m=>
   `<button class="act" onclick="quizGuess('${m}')">${m}</button>`).join('');
 mode('learn');loadLearn();loadCmp();
}
function loadLearn(){
 const m=$('learnSel').value;if(!m)return;
 $('learnVid').src='/api/video/'+m;
 const s=window.metrics[m]||{};
 $('learnMetrics').textContent=
   `psnr ${s.psnr?s.psnr.toFixed(2):'—'} dB · ssim ${s.ssim?s.ssim.toFixed(4):'—'} · ${s.bitrate_kbps||'—'} kbps`;
}
function loadCmp(){
 if($('cmpA').value)$('vidA').src='/api/video/'+$('cmpA').value;
 if($('cmpB').value)$('vidB').src='/api/video/'+$('cmpB').value;
}
function syncPlay(){
 $('vidA').currentTime=0;$('vidB').currentTime=0;
 $('vidA').play();$('vidB').play();
}
async function quizStart(){
 const r=await j('/api/quiz/start',{method:'POST'});
 quizToken=r.token;$('quizFeedback').textContent='';
 $('quizVid').src='/api/quiz/video?t='+r.token;
 $('scorePill').hidden=false;$('scorePill').textContent=`${score} / ${total}`;
}
async function quizGuess(m){
 if(!quizToken)return;
 const r=await j('/api/quiz/guess',{method:'POST',
   headers:{'Content-Type':'application/json'},
   body:JSON.stringify({token:quizToken,guess:m})});
 score=r.score;total=r.total;
 $('scorePill').textContent=`${score} / ${total}`;
 $('quizFeedback').innerHTML=r.correct
   ?`<span class="ok">Correct — ${r.answer}</span>`
   :`<span class="bad">It was ${r.answer}</span>`;
 quizToken=null;
}
async function quizSave(){
 const r=await j('/api/quiz/save',{method:'POST'});
 $('quizSaveMsg').textContent='saved to '+r.path;
}
async function loadResults(){
 const r=await j('/api/experiment-results');
 const exps=r.experiments||[];
 if(!exps.length){$('resultsBody').textContent='no experiment results yet';return}
 const rows=exps.map(e=>
  `<tr><td>${e.base_name||e.name}</td><td>${fmt(e.vfi_psnr)}</td>
   <td>${fmt(e.overall_psnr)}</td><td>${fmt(e.ssim,4)}</td>
   <td>${fmt(e.time_seconds,1)}</td></tr>`).join('');
 $('resultsBody').innerHTML=
  `<table><tr><th>experiment</th><th>VFI PSNR</th><th>overall PSNR</th>
   <th>SSIM</th><th>time s</th></tr>${rows}</table>`;
}
function fmt(v,d=2){return (v===undefined||v===null)?'—':(+v).toFixed(d)}
async function newInterval(){
 $('clipPill').textContent='cutting new interval…';
 const r=await j('/api/new-interval',{method:'POST'});
 if(r.status==='done'){$('clipPill').textContent=`new interval @ ${r.start_time}s`;init()}
 else if(r.status==='fallback'){$('clipPill').textContent='regenerating (see status)…'}
 else{$('clipPill').textContent=r.error||'new-interval failed'}
}
init();
</script></body></html>"""


class AppState:
    def __init__(self, benchmark_dir: str = "outputs/benchmark",
                 results_path: str = "outputs/experiment_results.json",
                 full_dir: str = "outputs/full_processed",
                 raw_video: str | None = None,
                 duration: float = 10.0,
                 out_dir: str = "outputs/blind_study"):
        self.benchmark_dir = Path(benchmark_dir)
        self.results_path = Path(results_path)
        self.full_dir = Path(full_dir)
        self.raw_video = raw_video
        self.duration = duration
        self.out_dir = Path(out_dir)
        self.active_clip = None
        self.processing = {"active": False, "progress": 0, "message": ""}
        self.lock = threading.Lock()
        self.rng = random.Random()
        self.quiz = {}  # token -> model
        self.quiz_answers = []
        self.quiz_score = 0

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
            e["base_name"] = re.sub(r"_(4K@120|1440p@90|1080p@60)$", "",
                                    e.get("name", ""))
        return data

    def models(self):
        meta = self.metadata()
        clips = meta.get("clips", {})
        clip = self.active_clip or (next(iter(clips)) if clips else None)
        return sorted(clips.get(clip, {}).get("videos", {})) if clip else []

    def video_path(self, model: str):
        meta = self.metadata()
        clips = meta.get("clips", {})
        clip = self.active_clip or (next(iter(clips)) if clips else None)
        if clip and model in clips.get(clip, {}).get("videos", {}):
            return Path(clips[clip]["videos"][model])
        p = self.benchmark_dir / f"{model}.mp4"
        return p if p.exists() else None

    # ---- quiz ----
    def quiz_start(self):
        models = self.models()
        if not models:
            return None
        token = f"q{len(self.quiz_answers)}_{self.rng.randrange(1 << 30)}"
        self.quiz[token] = self.rng.choice(models)
        return token

    def quiz_guess(self, token: str, guess: str):
        answer = self.quiz.pop(token, None)
        if answer is None:
            return {"error": "unknown or already-answered token"}, 400
        correct = guess == answer
        self.quiz_score += int(correct)
        self.quiz_answers.append({"answer": answer, "guess": guess,
                                  "correct": correct})
        return {"correct": correct, "answer": answer,
                "score": self.quiz_score,
                "total": len(self.quiz_answers)}, 200

    def quiz_save(self):
        self.out_dir.mkdir(parents=True, exist_ok=True)
        path = self.out_dir / "video_study_results.json"
        existing = json.loads(path.read_text()) if path.exists() else {"sessions": []}
        existing["sessions"].append({
            "timestamp": time.time(),
            "score": self.quiz_score,
            "total": len(self.quiz_answers),
            "answers": self.quiz_answers,
        })
        path.write_text(json.dumps(existing, indent=2))
        return {"path": str(path), "sessions": len(existing["sessions"])}

    # ---- interval switching ----
    def new_interval(self):
        """Fast path: re-cut pre-generated full videos (reference
        video_blind_study.py:1934-1985); fallback: background regeneration."""
        from benchmark_proper import extract_clip, get_full_video_duration

        if self.full_dir.exists():
            method_videos = sorted(self.full_dir.glob("*.mp4"))
            if method_videos:
                full_duration = get_full_video_duration(method_videos[0])
                if full_duration > self.duration + 2:
                    start = self.rng.uniform(1, full_duration - self.duration - 1)
                    self.benchmark_dir.mkdir(parents=True, exist_ok=True)
                    meta_path = self.benchmark_dir / "clips_metadata.json"
                    meta = (json.loads(meta_path.read_text())
                            if meta_path.exists() else {"clips": {}})
                    clip = self.active_clip or "full"
                    entry = meta["clips"].setdefault(
                        clip, {"videos": {}, "metrics": {}})
                    ok_all = True
                    for vid in method_videos:
                        out = self.benchmark_dir / f"{vid.stem}.mp4"
                        if extract_clip(vid, self.raw_video, start,
                                        self.duration, out):
                            entry["videos"][vid.stem] = str(out)
                        else:
                            ok_all = False
                    meta_path.write_text(json.dumps(meta, indent=2))
                    if ok_all:
                        return {"status": "done", "start_time": round(start, 1)}
        # fallback: full regeneration in the background
        if not self.start_reprocess([]):
            return {"error": "Already processing"}, 409
        return {"status": "fallback"}

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
            if url.path == "/":
                body = HTML_PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if url.path == "/api/metadata":
                return self._json(state.metadata())
            if url.path == "/api/experiment-results":
                return self._json(state.experiment_results())
            if url.path == "/api/processing-status":
                return self._json(state.processing)
            if url.path == "/api/available-clips":
                return self._json({"clips": list(state.metadata().get("clips", {})),
                                   "active": state.active_clip})
            if url.path == "/api/quiz/video":
                from urllib.parse import parse_qs

                token = parse_qs(url.query).get("t", [""])[0]
                model = state.quiz.get(token)
                path = state.video_path(model) if model else None
                if path is None or not path.exists():
                    return self._json({"error": "no active quiz round"}, 404)
                return self._stream_video(path)
            if url.path.startswith("/api/video/"):
                model = url.path.split("/api/video/", 1)[1]
                path = state.video_path(model)
                if path is None or not path.exists():
                    return self._json({"error": f"no video for {model}"}, 404)
                return self._stream_video(path)
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
                result = state.new_interval()
                if isinstance(result, tuple):
                    return self._json(result[0], result[1])
                return self._json(result)
            if url.path == "/api/quiz/start":
                token = state.quiz_start()
                if token is None:
                    return self._json({"error": "no videos available"}, 404)
                return self._json({"token": token})
            if url.path == "/api/quiz/guess":
                obj, code = state.quiz_guess(str(body.get("token", "")),
                                             str(body.get("guess", "")))
                return self._json(obj, code)
            if url.path == "/api/quiz/save":
                return self._json(state.quiz_save())
            self._json({"error": "unknown endpoint"}, 404)

    return Handler


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark-dir", default="outputs/benchmark")
    parser.add_argument("--results", default="outputs/experiment_results.json")
    parser.add_argument("--full-dir", default="outputs/full_processed",
                        help="pre-generated full-length per-method videos "
                        "used by the fast /api/new-interval path")
    parser.add_argument("--raw-video", default=None,
                        help="source video for audio in re-cut intervals")
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--port", type=int, default=5001)
    args = parser.parse_args()
    state = AppState(args.benchmark_dir, args.results, args.full_dir,
                     args.raw_video, args.duration)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"Video blind study on http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
