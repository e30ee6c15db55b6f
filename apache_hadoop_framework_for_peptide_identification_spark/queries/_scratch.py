"""Shared per-invocation fixture-dir discipline for registered queries.

Moved out of pipeline_q (r19 — VERDICT r18 item 5): the helper was
applied to pipeline_q's WARC fixtures in r18 while ~20 queries in
sources_q / streaming_q / epipe still leaked one bare-mkdtemp dir per
driver sweep. One implementation here, every fixture-materializing
query imports it.
"""

from __future__ import annotations


def _scratch_dir(prefix: str) -> str:
    """mkdtemp + atexit rmtree — the q201/q203 fixture-dir discipline
    applied uniformly (VERDICT r17 item 5 / ADVICE r16 item 4's leak
    class): every query that materializes a planted fixture (WARC,
    sink output, stream source/checkpoint/store dirs) per invocation
    must tear it down at interpreter exit, or a full suite + driver
    sweep leaks one dir per invocation. A with-scoped
    TemporaryDirectory is wrong here — the returned DataFrames read
    the dir lazily, so it must outlive the builder call."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
