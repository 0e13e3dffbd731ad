"""TensorBoard scalar writer (parity: SummaryWriter usage at
dassl/engine/trainer.py:225-240,634-637).  Uses tf.summary when tensorflow
is importable; silently no-ops otherwise (zero hard dependency)."""


class TensorboardWriter:
    def __init__(self, log_dir):
        self._writer = None
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
            print(f"Initialize tensorboard (log_dir={log_dir})")
        except Exception:
            self._tf = None

    def scalar(self, tag, value, step):
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, value, step=int(step))

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None

    def __bool__(self):
        return self._writer is not None
