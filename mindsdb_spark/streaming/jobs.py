"""Jobs: periodic query execution — `CREATE JOB … EVERY n period`.

Reference: jobs are stored SQL lists with a schedule, run by a polling
scheduler process (mindsdb/interfaces/jobs/README.md:1-60,
jobs_controller.py, scheduler.py). Here a job is a callable over the
engine session; the scheduler is tick-driven (caller supplies `now`), so
tests are deterministic and a production loop is one thread calling
`run_pending(time.time())`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Job:
    name: str
    fn: Callable[[], object]
    every_seconds: float | None  # None = one-time job (runs once, then
    # the scheduler drops it — reference: a job without EVERY executes a
    # single time, jobs_controller.py / test_jobs.py test_conditional_job)
    start_at: float | None = None
    end_at: float | None = None
    last_run: float | None = None
    runs: int = 0
    history: list = field(default_factory=list)
    sql: str = ""  # the job body, surfaced in log.jobs_history

    @property
    def one_time(self) -> bool:
        return self.every_seconds is None

    def due(self, now: float) -> bool:
        if self.start_at is not None and now < self.start_at:
            return False
        if self.end_at is not None and now > self.end_at:
            return False
        if self.last_run is None:
            return True
        if self.one_time:
            return False
        return now - self.last_run >= self.every_seconds


class JobScheduler:
    def __init__(self):
        self.jobs: dict[str, Job] = {}

    def create_job(self, name, fn, every_seconds, start_at=None, end_at=None, sql="") -> Job:
        job = Job(name, fn, every_seconds, start_at, end_at, sql=sql)
        self.jobs[name] = job
        return job

    def drop_job(self, name: str) -> None:
        self.jobs.pop(name, None)

    def run_pending(self, now: float) -> list[str]:
        ran = []
        for job in self.jobs.values():
            if job.due(now):
                try:
                    result = job.fn()
                    job.history.append(("ok", now, result))
                except Exception as ex:  # job errors are recorded, not fatal
                    job.history.append(("error", now, repr(ex)))
                job.last_run = now
                job.runs += 1
                ran.append(job.name)
        for name in [j.name for j in self.jobs.values() if j.one_time and j.runs > 0]:
            del self.jobs[name]
        return ran
