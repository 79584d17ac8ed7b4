"""Micro-batch runner utilities on top of plans.crawl.Crawler.

Structured Streaming proper cannot host the crawl (the frontier is both
source and sink of the same loop — self-feedback is forbidden by
readStream), so the engine advances generations as deterministic batches
(SURVEY.md §7.7). This module adds the streaming-flavored conveniences:
a progress listener (the engine's analogue of StreamingQueryProgress /
the reference's spinner thread, main.rs:952-982) and a budgeted runner.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field


@dataclass
class GenerationProgress:
    generation: int
    wall_s: float
    frontier_status: dict


@dataclass
class ProgressLog:
    history: list = field(default_factory=list)
    stream = sys.stderr

    def on_generation(self, p: GenerationProgress) -> None:
        self.history.append(p)
        pending = p.frontier_status.get("pending", 0)
        fetched = p.frontier_status.get("fetched", 0)
        print(
            f"[img-spark] gen={p.generation} wall={p.wall_s:.1f}s "
            f"pending={pending} fetched={fetched}",
            file=self.stream,
        )


def run_with_progress(crawler, seeds=None, max_generations=None,
                      listener: ProgressLog | None = None):
    """Crawler.run with per-generation progress callbacks and wall-time
    accounting; returns (final_stats, history)."""
    listener = listener or ProgressLog()
    if seeds is not None:
        crawler.init(seeds)
    limit = max_generations or crawler.cfg.max_generations
    stats: dict = {}
    for _ in range(limit):
        t0 = time.time()
        stats = crawler.step()
        listener.on_generation(
            GenerationProgress(crawler.generation, time.time() - t0, stats)
        )
        if stats.get("pending", 0) == 0:
            break
    return stats, listener.history
