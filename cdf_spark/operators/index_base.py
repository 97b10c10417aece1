"""Shared persistence discipline for the incremental-index family.

Every persisted index in this suite (LMIndex, NBIndex,
ExactSubstrIndex, MinHashLSHIndex, IVFIndex, InvertedIndex, DSIRIndex)
keeps a `meta.json` pointer under its root and commits state changes
by writing data files FIRST and swapping the pointer LAST via an
atomic tmp+rename — a crash mid-mutation leaves the previous index
live (the staged-commit rule the destinations follow). That pointer
logic was copy-pasted per class and had started to drift (the r12
review found IVFIndex.delete missing the dead-id anti-join its
InvertedIndex sibling had); this mixin holds it once.

Deliberately NOT shared: sweep/reclaim policies (append-only parts
with retire-then-sweep vs versioned dirs with keep-live-minus-one
differ by design per artifact shape) and the epoch fence comparison
(one line, but it reads each class's own meta layout)."""

from __future__ import annotations


class IndexArtifact:
    """Root-dir + atomic meta-pointer plumbing for a persisted index."""

    def __init__(self, root):
        from pathlib import Path as _P

        self.root = _P(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _meta(self) -> dict | None:
        import json as _json

        p = self.root / "meta.json"
        return _json.loads(p.read_text()) if p.exists() else None

    def _swap_meta(self, meta: dict) -> None:
        """Atomic pointer swap (tmp + rename) — a crash mid-write must
        leave the PREVIOUS meta intact, or the documented
        crash-leaves-old-state-live guarantee is void at the one step
        that matters."""
        import json as _json

        tmp = self.root / "meta.json.tmp"
        tmp.write_text(_json.dumps(meta))
        tmp.replace(self.root / "meta.json")
