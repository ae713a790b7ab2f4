#!/usr/bin/env python
"""Desktop (tkinter) blind-study variant (reference gui/blind_study_app.py,
571 LoC): the same two-phase learning/quiz flow as web_app.py in a local
window. Requires a display; in headless environments use gui/web_app.py."""

import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    try:
        import tkinter as tk
        from tkinter import messagebox
    except Exception as e:
        raise SystemExit(
            f"tkinter unavailable ({e}); use the web variant: python gui/web_app.py"
        )

    import cv2
    from PIL import Image, ImageTk

    from gui.web_app import StudyState

    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/processed"
    state = StudyState(data_dir)
    clips = state.clips()
    if not clips:
        raise SystemExit(f"no processed clips in {data_dir}")
    pairs = state.pairs(clips[0])

    root = tk.Tk()
    root.title("VFI Blind Study")
    idx = {"i": 0, "correct": 0, "total": 0}
    label = tk.Label(root)
    label.pack()
    status = tk.Label(root, text="Which side is ground truth? (A=left, B=right)")
    status.pack()

    def show():
        pair = pairs[idx["i"] % len(pairs)]
        state.shuffle(str(pair["pair_id"]))
        left = cv2.cvtColor(cv2.imread(pair["input_0"]), cv2.COLOR_BGR2RGB)
        right = cv2.cvtColor(cv2.imread(pair["gt_mid"] or pair["input_0"]), cv2.COLOR_BGR2RGB)
        import numpy as np

        h = min(left.shape[0], right.shape[0], 480)
        def fit(im):
            s = h / im.shape[0]
            return cv2.resize(im, (int(im.shape[1] * s), h))
        combo = np.hstack([fit(left), fit(right)])
        photo = ImageTk.PhotoImage(Image.fromarray(combo))
        label.configure(image=photo)
        label.image = photo

    def guess(side):
        pair = pairs[idx["i"] % len(pairs)]
        res = state.guess(str(pair["pair_id"]), side)
        idx["total"] += 1
        idx["correct"] += res["correct"]
        status.configure(
            text=f"{'Correct' if res['correct'] else 'Wrong'} — "
                 f"{idx['correct']}/{idx['total']} "
                 f"({100 * idx['correct'] / idx['total']:.0f}%)"
        )
        idx["i"] += 1
        show()

    root.bind("a", lambda e: guess("A"))
    root.bind("b", lambda e: guess("B"))
    show()
    root.mainloop()


if __name__ == "__main__":
    main()
