"""Priority-ordered training hooks (reference det3d/torchie/trainer/hooks/).

The optimizer hook has no analogue here — forward/backward/clip/step are
fused inside the jitted train step — but the observability hooks keep the
reference's shape: LogBuffer windowed means (log_buffer.py:6), text logging
every ``interval`` iters (hooks/logger/text.py:41-130), per-epoch
checkpointing (hooks/checkpoint.py:5), and iteration timing
(hooks/iter_timer.py:6).
"""
from __future__ import annotations

import logging
import time
from collections import OrderedDict
from typing import Optional


class LogBuffer:
    def __init__(self):
        self.val_history = OrderedDict()
        self.n_history = OrderedDict()
        self.output = OrderedDict()
        self.ready = False

    def clear(self):
        self.val_history.clear()
        self.n_history.clear()
        self.clear_output()

    def clear_output(self):
        self.output.clear()
        self.ready = False

    def update(self, vars: dict, count: int = 1):
        for k, v in vars.items():
            self.val_history.setdefault(k, []).append(float(v))
            self.n_history.setdefault(k, []).append(count)

    def average(self, n: int = 0):
        for k in self.val_history:
            v = self.val_history[k][-n:] if n > 0 else self.val_history[k]
            c = self.n_history[k][-n:] if n > 0 else self.n_history[k]
            total = sum(x * y for x, y in zip(v, c))
            self.output[k] = total / max(sum(c), 1)
        self.ready = True


class Hook:
    priority = 50

    def before_run(self, trainer):
        pass

    def after_run(self, trainer):
        pass

    def before_train_epoch(self, trainer):
        pass

    def after_train_epoch(self, trainer):
        pass

    def before_train_iter(self, trainer):
        pass

    def after_train_iter(self, trainer):
        pass


class IterTimerHook(Hook):
    priority = 60

    def before_train_epoch(self, trainer):
        self.t = time.time()

    def before_train_iter(self, trainer):
        trainer.log_buffer.update({"data_time": time.time() - self.t})

    def after_train_iter(self, trainer):
        trainer.log_buffer.update({"time": time.time() - self.t})
        self.t = time.time()


class TextLoggerHook(Hook):
    priority = 90

    def __init__(self, interval=20, logger: Optional[logging.Logger] = None):
        self.interval = interval
        self.logger = logger or logging.getLogger("sparse2dense_tpu")

    def after_train_iter(self, trainer):
        if (trainer.inner_iter + 1) % self.interval != 0:
            return
        trainer.log_buffer.average(self.interval)
        items = [f"epoch [{trainer.epoch + 1}][{trainer.inner_iter + 1}/"
                 f"{trainer.epoch_length}]"]
        if "lr" in trainer.current_stats:
            items.append(f"lr: {trainer.current_stats['lr']:.3e}")
        for k, v in trainer.log_buffer.output.items():
            items.append(f"{k}: {v:.4f}")
        self.logger.info(", ".join(items))
        trainer.log_buffer.clear_output()


class CheckpointHook(Hook):
    priority = 70

    def __init__(self, interval=1, out_dir=None):
        self.interval = interval
        self.out_dir = out_dir

    def after_train_epoch(self, trainer):
        if (trainer.epoch + 1) % self.interval != 0:
            return
        trainer.save_checkpoint(self.out_dir or trainer.work_dir)


def build_hooks(log_config=None, checkpoint_config=None, work_dir=None):
    hooks = [IterTimerHook()]
    if checkpoint_config:
        hooks.append(CheckpointHook(
            interval=checkpoint_config.get("interval", 1), out_dir=work_dir))
    interval = (log_config or {}).get("interval", 20)
    hooks.append(TextLoggerHook(interval=interval))
    return sorted(hooks, key=lambda h: h.priority)
