#!/usr/bin/env python
"""Desktop (tkinter) blind-study variant (reference gui/blind_study_app.py,
571 LoC): the same two-phase learning/quiz flow as gui/web_app.py in a
local window, over the same StudyState engine (method outputs rendered
through the framework, ranking-based scoring, persisted results).

Requires a display; in headless environments use gui/web_app.py.

Keys: space/n = next pair, q = start quiz, a / s / b = left/same/right,
w = save results.
"""

from __future__ import annotations

import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    try:
        import tkinter as tk
    except Exception as e:  # noqa: BLE001
        raise SystemExit(
            f"tkinter unavailable ({e}); use the web variant: python gui/web_app.py"
        )

    from PIL import Image, ImageTk

    from gui.web_app import StudyState

    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/processed"
    state = StudyState(data_dir)
    clips = state.clips()
    if not clips:
        raise SystemExit(f"no processed clips in {data_dir}")
    state.set_clip(clips[0])

    root = tk.Tk()
    root.title(f"VFI Blind Study — {clips[0]}")
    app = {"phase": "learning", "i": 0}

    img_row = tk.Frame(root)
    img_row.pack()
    panels, captions = [], []
    for col in range(3):
        f = tk.Frame(img_row)
        f.grid(row=0, column=col, padx=4, pady=4)
        cap = tk.Label(f, font=("TkDefaultFont", 11, "bold"))
        cap.pack()
        lbl = tk.Label(f)
        lbl.pack()
        captions.append(cap)
        panels.append(lbl)
    status = tk.Label(root, text="LEARNING — space: next pair, q: start quiz")
    status.pack(pady=4)

    def photo_from_jpeg(data: bytes, max_h=360):
        im = Image.open(io.BytesIO(data))
        s = max_h / im.height
        im = im.resize((int(im.width * s), max_h))
        return ImageTk.PhotoImage(im)

    def show():
        pairs = state.pair_list()
        p = pairs[app["i"] % len(pairs)]
        learning = app["phase"] == "learning"
        views = [("left", p["model_a"] if learning else "A"),
                 ("gt", "ground truth"),
                 ("right", p["model_b"] if learning else "B")]
        for col, (pos, name) in enumerate(views):
            if pos == "gt" and not learning:
                captions[col].configure(text="")
                panels[col].configure(image="")
                panels[col].image = None
                continue
            data = state.render(p["idx"], pos)
            photo = photo_from_jpeg(data) if data else None
            captions[col].configure(text=name)
            panels[col].configure(image=photo)
            panels[col].image = photo

    def next_pair(_=None):
        app["i"] += 1
        show()

    def start_quiz(_=None):
        state.shuffle()
        app["phase"] = "quiz"
        app["i"] = 0
        status.configure(text="QUIZ — a: left better, s: same, b: right better")
        show()

    def guess(choice):
        if app["phase"] != "quiz":
            return
        pairs = state.pair_list()
        p = pairs[app["i"] % len(pairs)]
        res, _ = state.guess(p["idx"], choice)
        verdict = "Correct" if res["correct"] else f"No — {res['correct_choice']}"
        status.configure(
            text=f"{verdict} ({res['model_a']} vs {res['model_b']}) — "
                 f"score {res['score']}/{res['total']}   [w: save]"
        )
        app["i"] += 1
        if app["i"] >= len(pairs):
            r = state.results()
            status.configure(
                text=f"DONE — {r['score']}/{r['total']} "
                     f"({100 * r['accuracy']:.0f}%)   [w: save]"
            )
        else:
            show()

    def save(_=None):
        out = state.save()
        status.configure(text=f"saved -> {out['path']} ({out['sessions']} sessions)")

    root.bind("<space>", next_pair)
    root.bind("n", next_pair)
    root.bind("q", start_quiz)
    root.bind("a", lambda e: guess("left"))
    root.bind("s", lambda e: guess("same"))
    root.bind("b", lambda e: guess("right"))
    root.bind("w", save)
    show()
    root.mainloop()


if __name__ == "__main__":
    main()
