"""Filesystem path helpers.

Capability parity with the reference `tools/tools.py:187-226` path collectors.
"""

from __future__ import annotations

import os
from typing import List


def collect_paths_to_files_in_subdirectories(path_to_directory: str, extension: str) -> List[str]:
    """Recursively collects sorted paths to files with the given extension."""
    paths = []
    for root, _dirs, files in os.walk(path_to_directory):
        for name in files:
            if name.endswith(extension):
                paths.append(os.path.join(root, name))
    return sorted(paths)


def collect_immediate_subdirectories(path_to_directory: str) -> List[str]:
    """Sorted names of the immediate subdirectories of a directory."""
    return sorted(
        d for d in os.listdir(path_to_directory)
        if os.path.isdir(os.path.join(path_to_directory, d))
    )


def makedirs_if_needed(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
