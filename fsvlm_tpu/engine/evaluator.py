"""Evaluators (parity: dassl/evaluation/).

The printed block format is a framework contract — tools/parse_test_res.py
scrapes "* accuracy: X%" lines after the "=> result" sentinel
(evaluator.py:67-125, parse_test_res.py:64-123).
"""

import os
from collections import OrderedDict, defaultdict

import numpy as np

from ..utils.registry import Registry

EVALUATOR_REGISTRY = Registry("EVALUATOR")


def build_evaluator(cfg, lab2cname=None):
    return EVALUATOR_REGISTRY.get(cfg.TEST.EVALUATOR)(cfg, lab2cname=lab2cname)


class EvaluatorBase:
    def __init__(self, cfg, **kwargs):
        self.cfg = cfg

    def reset(self):
        raise NotImplementedError

    def process(self, mo, gt):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError


@EVALUATOR_REGISTRY.register()
class Classification(EvaluatorBase):
    """Streaming top-1 accuracy + macro-F1 (+ per-class breakdown, confusion
    matrix) — dassl/evaluation/evaluator.py:26-125."""

    def __init__(self, cfg, lab2cname=None, **kwargs):
        super().__init__(cfg)
        self._lab2cname = lab2cname
        self._per_class = cfg.TEST.PER_CLASS_RESULT
        self.reset()

    def reset(self):
        self._correct = 0
        self._total = 0
        self._y_true = []
        self._y_pred = []
        self._per_class_res = defaultdict(list) if self._per_class else None

    def process(self, mo, gt):
        """mo: (B, C) logits or (B,) predicted labels; gt: (B,) labels."""
        mo = np.asarray(mo)
        gt = np.asarray(gt)
        pred = mo.argmax(axis=1) if mo.ndim == 2 else mo
        matches = (pred == gt).astype(np.int64)
        self._correct += int(matches.sum())
        self._total += int(gt.shape[0])
        self._y_true.extend(gt.tolist())
        self._y_pred.extend(pred.tolist())
        if self._per_class_res is not None:
            for label, m in zip(gt.tolist(), matches.tolist()):
                self._per_class_res[label].append(int(m))

    def evaluate(self):
        from sklearn.metrics import confusion_matrix, f1_score

        results = OrderedDict()
        acc = 100.0 * self._correct / max(self._total, 1)
        err = 100.0 - acc
        macro_f1 = 100.0 * f1_score(
            self._y_true,
            self._y_pred,
            average="macro",
            labels=np.unique(self._y_true),
        )
        results["accuracy"] = acc
        results["error_rate"] = err
        results["macro_f1"] = macro_f1

        print(
            "=> result\n"
            f"* total: {self._total:,}\n"
            f"* correct: {self._correct:,}\n"
            f"* accuracy: {acc:.1f}%\n"
            f"* error: {err:.1f}%\n"
            f"* macro_f1: {macro_f1:.1f}%"
        )

        if self._per_class_res is not None:
            print("=> per-class result")
            accs = []
            for label in sorted(self._per_class_res):
                res = self._per_class_res[label]
                class_acc = 100.0 * sum(res) / len(res)
                accs.append(class_acc)
                cname = self._lab2cname.get(label, "?") if self._lab2cname else "?"
                print(
                    f"* class: {label} ({cname})\t"
                    f"total: {len(res):,}\t"
                    f"correct: {sum(res):,}\t"
                    f"acc: {class_acc:.1f}%"
                )
            mean_acc = float(np.mean(accs))
            print(f"* average: {mean_acc:.1f}%")
            results["perclass_accuracy"] = mean_acc

        if self.cfg.TEST.COMPUTE_CMAT:
            cmat = confusion_matrix(self._y_true, self._y_pred, normalize="true")
            save_path = os.path.join(self.cfg.OUTPUT_DIR, "cmat.npy")
            np.save(save_path, cmat)
            print(f"Confusion matrix is saved to {save_path}")

        return results

    @property
    def y_true(self):
        return list(self._y_true)

    @property
    def y_pred(self):
        return list(self._y_pred)


def compute_accuracy(logits, labels, topk=(1,)):
    """Top-k accuracy in percent (dassl/metrics/accuracy.py:1-31)."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    maxk = max(topk)
    order = np.argsort(-logits, axis=1)[:, :maxk]
    correct = order == labels[:, None]
    res = []
    for k in topk:
        acc = 100.0 * correct[:, :k].any(axis=1).mean()
        res.append(acc)
    return res
