"""stdlib-backed shim for the psutil subset ru_address uses (RSS reporting,
/root/reference/ru_address/common.py:37-39). Output goes to stdout only and
never into dump files, so parity is unaffected."""
import resource


class _MemInfo:
    def __init__(self, rss):
        self.rss = rss


class Process:
    def __init__(self, pid=None):
        self._pid = pid

    def memory_info(self):
        return _MemInfo(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024)
