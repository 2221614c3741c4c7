"""Remote / process-boundary source patterns (SURVEY §2.1 S9 + S10).

S9 — the reference wraps every MODIS API call in a retry-forever loop
(``while(try-error){Sys.sleep(3); retry}``, R/ingest_modis_bysite.R:146-259).
:func:`fetch_with_retry` is that pattern with the loop BOUNDED and the
failure loud — retry-forever hides dead credentials/endpoints behind an
infinite hang; at pipeline scale you want the task to fail and the
checkpoint/resume layer (retention.AggregateStore) to pick up where it
left off on the next run. Fetches are driver-side CATALOG operations (one
call per site/tile, results land in files Spark then scans) — the same
split the reference uses.

S10 — the reference shells out to a python script for GEE downloads
(``system("python gee_subset.py -p … -s … -e …")``,
R/ingest_gee_bysite.R:103-127). :func:`run_subprocess_source` is that
process-boundary source: run a command that materializes CSV/parquet, then
hand the output path to a Spark scan. stdout/stderr are captured and
surfaced on failure instead of vanishing like R's ``system()``.
"""

from __future__ import annotations

import subprocess
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class RetryExhausted(RuntimeError):
    """All attempts failed; carries every attempt's error."""

    def __init__(self, what: str, errors: list[Exception]):
        super().__init__(
            f"{what}: all {len(errors)} attempts failed; last: {errors[-1]!r}"
        )
        self.errors = errors


def fetch_with_retry(
    fetch: Callable[[], T],
    what: str = "fetch",
    max_tries: int = 5,
    sleep_s: float = 3.0,
    backoff: float = 2.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleeper: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``fetch`` until it succeeds, sleeping ``sleep_s * backoff**k``
    between attempts (the reference sleeps a flat 3 s forever; bounded
    exponential backoff is the production form of the same loop). Raises
    :class:`RetryExhausted` after ``max_tries`` failures."""
    errors: list[Exception] = []
    for attempt in range(max_tries):
        try:
            return fetch()
        except retry_on as e:  # noqa: PERF203 — the loop IS the operator
            errors.append(e)
            if attempt + 1 < max_tries:
                sleeper(sleep_s * backoff**attempt)
    raise RetryExhausted(what, errors)


def run_subprocess_source(
    cmd: list[str],
    output_path: str,
    timeout_s: float = 600.0,
    max_tries: int = 1,
    sleep_s: float = 3.0,
) -> str:
    """Run an external producer process and return ``output_path`` for a
    Spark scan. Non-zero exit or a missing/empty output raises with the
    captured stderr (composable with :func:`fetch_with_retry` via
    ``max_tries``)."""
    import os

    def attempt() -> str:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"source subprocess {cmd[0]!r} exited {proc.returncode}; "
                f"stderr: {proc.stderr[-2000:]}"
            )
        if not os.path.exists(output_path) or os.path.getsize(output_path) == 0:
            raise RuntimeError(
                f"source subprocess {cmd[0]!r} produced no output at "
                f"{output_path}; stdout: {proc.stdout[-500:]}"
            )
        return output_path

    if max_tries == 1:
        return attempt()
    return fetch_with_retry(
        attempt, what=f"subprocess source {cmd[0]}", max_tries=max_tries,
        sleep_s=sleep_s,
    )
