"""Training drivers and experiment infrastructure (reference parity: pfrl/experiments/)."""

from pfrl_tpu.experiments.evaluation_hooks import (
    EvaluationHook,
    OptunaPrunerHook,
)
from pfrl_tpu.experiments.evaluator import (
    AsyncEvaluator,
    Evaluator,
    batch_run_evaluation_episodes,
    eval_performance,
    run_evaluation_episodes,
)
from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)
from pfrl_tpu.experiments.hooks import LinearInterpolationHook, StepHook
from pfrl_tpu.experiments.prepare_output_dir import prepare_output_dir
from pfrl_tpu.experiments.onpolicy_runner import (
    OnPolicyRunner,
    OnPolicyRunnerState,
)
from pfrl_tpu.experiments.runner import (
    JaxEvalLoop,
    OffPolicyRunner,
    RunnerConfig,
)
from pfrl_tpu.experiments.train_agent import (
    train_agent,
    train_agent_with_evaluation,
)
from pfrl_tpu.experiments.train_agent_async import train_agent_async
from pfrl_tpu.experiments.train_agent_batch import (
    train_agent_batch,
    train_agent_batch_with_evaluation,
)

__all__ = [
    "add_demo_args",
    "maybe_load_train_state",
    "run_demo_if_requested",
    "save_train_state_if_requested",
    "EvaluationHook",
    "OptunaPrunerHook",
    "train_agent_async",
    "AsyncEvaluator",
    "Evaluator",
    "batch_run_evaluation_episodes",
    "eval_performance",
    "run_evaluation_episodes",
    "LinearInterpolationHook",
    "StepHook",
    "prepare_output_dir",
    "JaxEvalLoop",
    "OffPolicyRunner",
    "OnPolicyRunner",
    "OnPolicyRunnerState",
    "RunnerConfig",
    "train_agent",
    "train_agent_with_evaluation",
    "train_agent_batch",
    "train_agent_batch_with_evaluation",
]
