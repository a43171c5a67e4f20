"""Software-update check.

Equivalent of the reference's self-update subsystem (``update.rs:1-211``):
semver comparison against the latest published release and an update
handshake. Network access is environment-gated — in offline environments
the check reports "unknown" instead of failing.
"""

from __future__ import annotations

import json
import re
import urllib.error
import urllib.request
from typing import Optional

from thz_image_explorer_tpu import __version__

RELEASES_URL = (
    "https://api.github.com/repos/unibe-icelab/thz-image-explorer/releases/latest"
)


def parse_version(v: str) -> tuple[int, int, int]:
    m = re.match(r"v?(\d+)\.(\d+)\.(\d+)", v.strip())
    if not m:
        raise ValueError(f"not a semver string: {v!r}")
    return tuple(int(g) for g in m.groups())  # type: ignore[return-value]


def is_newer(candidate: str, current: str) -> bool:
    return parse_version(candidate) > parse_version(current)


def check_for_updates(
    current: str = __version__, timeout: float = 5.0
) -> Optional[str]:
    """Return the newer version tag if one exists, None when up to date,
    and None (with no error) when the network is unavailable."""
    try:
        with urllib.request.urlopen(RELEASES_URL, timeout=timeout) as r:
            data = json.load(r)
        tag = data.get("tag_name", "")
        if tag and is_newer(tag, current):
            return tag
        return None
    except (urllib.error.URLError, OSError, ValueError, json.JSONDecodeError):
        return None
