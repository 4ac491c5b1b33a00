"""Progressive growth schedule: global step -> (stage, fade alpha)
(SURVEY.md §2.4 G3, §3.4).

Behavioral contract (the [E]-grade part): each stage > 0 has a fade-in
interval (alpha ramping 0 -> 1 linearly with the global step) followed by a
stabilization interval (alpha = 1); stage 0 has no fade. The rebuild keys
the schedule off the global step in a single training run (the reference
family's continuous-growth idiom) but compiles one step function per stage
— ``stage`` is a static Python int, ``alpha`` a traced scalar, so the fade
itself never recompiles (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple


@dataclasses.dataclass(frozen=True)
class ProgressiveSchedule:
    num_stages: int = 7
    fade_steps: int = 800_000
    stable_steps: int = 800_000

    def stage_and_alpha(self, step: int) -> Tuple[int, float]:
        """(stage, alpha) at a global step. Pure Python — drives the outer
        loop; alpha is re-derived identically on restore."""
        if step < self.stable_steps:
            return 0, 1.0
        rem = step - self.stable_steps
        per_stage = self.fade_steps + self.stable_steps
        stage = min(1 + rem // per_stage, self.num_stages - 1)
        if 1 + rem // per_stage > self.num_stages - 1:
            return self.num_stages - 1, 1.0  # past the ladder: train at top
        within = rem % per_stage
        alpha = min(1.0, (within + 1) / self.fade_steps) if self.fade_steps else 1.0
        return stage, alpha

    def total_steps(self) -> int:
        """Steps to finish the whole ladder (end of last stabilization)."""
        return self.stable_steps + (self.num_stages - 1) * (
            self.fade_steps + self.stable_steps
        )

    def stage_boundaries(self) -> Iterator[Tuple[int, int, int]]:
        """Yields (stage, start_step, end_step) segments in order."""
        yield 0, 0, self.stable_steps
        start = self.stable_steps
        for s in range(1, self.num_stages):
            end = start + self.fade_steps + self.stable_steps
            yield s, start, end
            start = end
