from moegan_tpu.orchestration.flags import FlagStore
from moegan_tpu.orchestration.jobs import JobRunner, JobSpec
from moegan_tpu.orchestration.pipeline import Pipeline, STAGES

__all__ = ["FlagStore", "JobRunner", "JobSpec", "Pipeline", "STAGES"]
