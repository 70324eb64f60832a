"""Multi-task priority scheduling (reference O4 + daemon cycle).

The reference daemon orders runnable tasks each cycle: ``absolute``
priority policy keeps ONLY the max-priority started tasks; ``relative``
sorts by priority and serves all (master/scheduler/daemon.ts:220-241).
Here tasks are (JobConfig, Frontier) pairs; the scheduler selects which
frontiers get fetch capacity this cycle and splits the chunk budget by
priority weight.
"""

from __future__ import annotations

from ..config import JobConfig


def select_tasks(tasks: list[JobConfig], policy: str | None = None) -> list[JobConfig]:
    """Order/filter runnable tasks per the reference policy.

    absolute → only tasks at the maximum priority level;
    relative → all tasks, sorted by priority desc (stable).
    The policy of the FIRST task applies when not given (the reference
    reads it from system config per cycle).
    """
    if not tasks:
        return []
    policy = policy or tasks[0].priority_policy
    if policy == "absolute":
        top = max(t.priority for t in tasks)
        return [t for t in tasks if t.priority == top]
    return sorted(tasks, key=lambda t: -t.priority)


def capacity_shares(tasks: list[JobConfig], total_chunks: int,
                    policy: str | None = None) -> dict[str, int]:
    """Split a fetch-capacity budget across selected tasks
    proportionally to priority (relative) or evenly among max-priority
    tasks (absolute). Every selected task gets ≥1."""
    sel = select_tasks(tasks, policy)
    if not sel:
        return {}
    weights = {t.name: t.priority for t in sel}
    wsum = sum(weights.values())
    shares = {name: max(1, (total_chunks * w) // wsum)
              for name, w in weights.items()}
    return shares
