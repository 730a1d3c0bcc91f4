"""Sample-sheet ("fof") parsing — the reference's input manifest.

Format (io/fof.hpp:39-44,116-141):  ``ID : path1 ; path2 ! amin``
one sample per line; the optional ``! amin`` suffix overrides the global
abundance minimum for that sample (fof.hpp:136-137); IDs must be unique.

Here a sample maps to a set of input URIs (parquet/Iceberg paths or a
predicate on the pages table) plus its per-sample soft-min override.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_LINE = re.compile(
    r"^\s*(?P<id>[^\s:;!]+)\s*:\s*(?P<paths>[^!]+?)\s*(?:!\s*(?P<amin>\d+)\s*)?$"
)


@dataclass(frozen=True)
class Sample:
    sample_id: str
    paths: tuple[str, ...]
    abundance_min: int | None = None


def parse_fof(text: str) -> list[Sample]:
    """Parse an fof manifest; blank lines and #-comments skipped.

    Raises ValueError on malformed lines or duplicate IDs, matching the
    reference's checks (fof.hpp:121-134).
    """
    out: list[Sample] = []
    seen: set[str] = set()
    for ln, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = _LINE.match(line)
        if not m:
            raise ValueError(f"fof line {ln}: cannot parse {raw!r}")
        sid = m.group("id")
        if sid in seen:
            raise ValueError(f"fof line {ln}: duplicate sample id {sid!r}")
        seen.add(sid)
        paths = tuple(p.strip() for p in m.group("paths").split(";") if p.strip())
        if not paths:
            raise ValueError(f"fof line {ln}: no paths for {sid!r}")
        amin = int(m.group("amin")) if m.group("amin") else None
        out.append(Sample(sid, paths, amin))
    return out


def soft_min_overrides(samples: list[Sample]) -> dict[str, int]:
    return {s.sample_id: s.abundance_min for s in samples if s.abundance_min is not None}
