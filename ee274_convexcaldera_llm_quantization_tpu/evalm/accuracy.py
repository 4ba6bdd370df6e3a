"""Yes/no QA accuracy harness (POPE-style evaluation).

The reference's flagship eval is POPE yes/no accuracy over generated text
(``main.py:340-404``): generate greedily, regex-extract the first yes/no,
compare to the label, track running accuracy, and continue past per-example
failures. This module reproduces that protocol over any tokenized dataset
(the datasets themselves are external; a tokenizer adapter maps text to
ids).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ee274_convexcaldera_llm_quantization_tpu.models.config import ModelConfig
from ee274_convexcaldera_llm_quantization_tpu.models import llama

_YESNO = re.compile(r"\b(yes|no)\b", re.IGNORECASE)


def extract_yes_no(text: str) -> Optional[str]:
    """First yes/no word in the generated text (ref ``main.py:362-375``)."""
    m = _YESNO.search(text)
    return m.group(1).lower() if m else None


@dataclasses.dataclass
class QAExample:
    prompt_tokens: np.ndarray
    label: str                     # "yes" | "no"


@dataclasses.dataclass
class AccuracyResult:
    accuracy: float
    num_correct: int
    num_evaluated: int
    num_failed: int                # unparseable / errored examples
    per_example: List[Tuple[int, Optional[str], str]]


def evaluate_yes_no_accuracy(
    params,
    examples: Sequence[QAExample],
    config: ModelConfig,
    detokenize: Callable[[Sequence[int]], str],
    max_new_tokens: int = 200,
    use_pallas: bool = False,
    interpret: bool = False,
    progress: Optional[Callable[[int, float], None]] = None,
) -> AccuracyResult:
    """Greedy generation + yes/no extraction, robust to per-example failure
    (the reference wraps each example in try/except, ``main.py:389-392``)."""
    correct = 0
    failed = 0
    per_example = []
    for i, ex in enumerate(examples):
        try:
            prompt = jnp.asarray(ex.prompt_tokens, jnp.int32)[None, :]
            out = llama.generate_greedy(params, prompt, max_new_tokens,
                                        config, use_pallas, interpret)
            gen = np.asarray(out[0, prompt.shape[1]:]).tolist()
            answer = extract_yes_no(detokenize(gen))
        except Exception:
            answer = None
        if answer is None:
            failed += 1
        elif answer == ex.label:
            correct += 1
        per_example.append((i, answer, ex.label))
        if progress is not None:
            progress(i, correct / max(i + 1, 1))
    n = len(examples)
    return AccuracyResult(
        accuracy=correct / max(n, 1),
        num_correct=correct,
        num_evaluated=n,
        num_failed=failed,
        per_example=per_example,
    )
