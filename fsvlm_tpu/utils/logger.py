"""stdout tee logger.

Parity with dassl/utils/logger.py:11-72: everything printed is mirrored to
``<output_dir>/log.txt``; if the file already exists a timestamp suffix is
appended so old runs are never clobbered.  Downstream result aggregation
(tools/parse_test_res.py) scrapes these log files, so the format and the
file name are part of the framework contract.
"""

import os
import sys
import time


class Logger:
    def __init__(self, fpath=None):
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            d = os.path.dirname(fpath)
            if d:  # bare filenames log to the CWD
                os.makedirs(d, exist_ok=True)
            self.file = open(fpath, "w")

    def __del__(self):
        self.close()

    def write(self, msg):
        self.console.write(msg)
        if self.file is not None:
            self.file.write(msg)

    def flush(self):
        self.console.flush()
        if self.file is not None:
            self.file.flush()
            os.fsync(self.file.fileno())

    def close(self):
        self.console.flush()
        if self.file is not None:
            self.file.close()
            self.file = None


def setup_logger(output=None):
    if output is None:
        return
    if output.endswith(".txt") or output.endswith(".log"):
        fpath = output
    else:
        fpath = os.path.join(output, "log.txt")

    if os.path.exists(fpath):
        # keep old log files (reference appends a timestamp suffix)
        fpath += time.strftime("-%Y-%m-%d-%H-%M-%S")

    sys.stdout = Logger(fpath)
