"""Early stopping on a monitored metric.

Reference: ``Our_UNet/src/train.py:166-202`` — patience counter with
``min_delta=0.001``; an epoch counts as "no improvement" when
``score < best + min_delta`` (score negated for mode='min'). The AE trainer's
variant (``reconstruction/src/train.py:146-182``) has inverted comparison
logic (documented reference bug); this implementation uses the correct
Our_UNet semantics for both modes — a deliberate, documented divergence in
broken tooling, per SURVEY §7.3.
"""

from __future__ import annotations


class EarlyStopping:
    def __init__(
        self,
        patience: int = 10,
        mode: str = "max",
        min_delta: float = 0.001,
        verbose: bool = True,
    ):
        assert mode in ("min", "max")
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False

    def state_dict(self) -> dict:
        """Serializable state so ``--resume`` reproduces the exact stopping
        epoch of an uninterrupted run (the reference resets the patience
        counter on resume — ``Our_UNet/src/train.py:905`` constructs a fresh
        EarlyStopping; beaten here, not matched)."""
        return {"counter": self.counter, "best_score": self.best_score}

    def load_state_dict(self, state: dict | None) -> "EarlyStopping":
        if state:
            self.counter = int(state.get("counter", 0))
            best = state.get("best_score")
            self.best_score = None if best is None else float(best)
        return self

    def __call__(self, val_score: float) -> bool:
        score = -val_score if self.mode == "min" else val_score
        if self.best_score is None:
            self.best_score = score
        elif score < self.best_score + self.min_delta:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.counter = 0
        return self.early_stop
