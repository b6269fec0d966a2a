"""Process-scoped temp layout roots with stale-sibling cleanup.

The layout-building driver rows (fileskip/zorder routed scans, the
bucketed join, the matview replay) rebuild their table layouts under
``$TMP/<family>/<pid>/...`` so concurrent sessions cannot race one
fixed path (one harvests a footer manifest while another rewrites
mid-overwrite and every row double-counts). The pid key alone leaks:
dead processes leave full table copies behind. ``pid_scoped_dir``
therefore sweeps sibling pid dirs whose process is gone before
handing back the caller's own path — each family's footprint stays
bounded by the number of LIVE sessions.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True
    return True


def pid_scoped_dir(family: str, *parts: str) -> str:
    """``$TMP/<family>/<pid>/<parts...>`` — and reap siblings whose
    pid no longer runs. Best-effort: cleanup errors never fail the
    query path."""
    base = os.path.join(tempfile.gettempdir(), family)
    try:
        for entry in os.listdir(base):
            if not entry.isdigit():
                # pre-pid-isolation leftovers (e.g. a bare sf0.001/):
                # only this module ever owned the family root, so any
                # non-pid sibling is a legacy layout — reap it, but
                # LOUDLY, so a future writer that breaks the
                # module-owns-the-root invariant fails visibly
                # instead of losing data silently
                import logging

                logging.getLogger(__name__).warning(
                    "tmputil: reaping legacy non-pid entry %s under %s",
                    entry,
                    base,
                )
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
                continue
            if int(entry) == os.getpid():
                continue
            if not _pid_alive(int(entry)):
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
    except OSError:
        pass
    return os.path.join(base, str(os.getpid()), *parts)
