"""Shared BENCH.md section splice for the bench scripts.

Every bench owns exactly one ``## <marker>...`` section. replace_section
swaps that section in place (head + everything after the NEXT ``## ``
heading survives) or appends it — the uniform contract that keeps
independently-run benches from destroying each other's measurements
(ann_bench's private truncate-to-EOF copy once deleted every section
after its own).
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_MD = os.path.join(REPO_ROOT, "BENCH.md")


def replace_section(marker: str, section: str, path: str = BENCH_MD) -> None:
    """Replace the section starting at ``marker`` (a line beginning with
    ``## ``) through the next ``## `` heading with ``section``; append if
    absent. No-op when the file does not exist (nothing to splice into).
    ``section`` should start with its own heading line containing
    ``marker``."""
    if not os.path.exists(path):
        return
    text = open(path).read()
    if marker in text:
        head = text[: text.index(marker)].rstrip()
        rest = text[text.index(marker) :]
        nxt = rest.find("\n## ", 1)
        tail = rest[nxt + 1 :] if nxt != -1 else ""
        text = head + "\n" + tail
    with open(path, "w") as f:
        f.write(text.rstrip() + "\n" + section)
