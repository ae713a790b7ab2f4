#!/usr/bin/env python
"""Register a source clip (reference scripts/register_clip.py CLI)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description="Register a source gameplay clip")
    parser.add_argument("video", help="Path to the source video (>=1080p, >=60fps)")
    parser.add_argument("--clip-id", required=True, help="Unique clip identifier")
    parser.add_argument("--data-dir", default="data", help="Dataset root (default: data)")
    parser.add_argument("--force", action="store_true", help="Overwrite existing entry")
    args = parser.parse_args()

    from vfisr_tpu.data.registry import ClipRegistry

    entry = ClipRegistry(args.data_dir).register(args.video, args.clip_id, force=args.force)
    print(f"Registered {entry['clip_id']}: {entry['width']}x{entry['height']}@{entry['fps']}fps, "
          f"{entry['duration_s']:.1f}s ({entry['frame_count']} frames)")


if __name__ == "__main__":
    main()
