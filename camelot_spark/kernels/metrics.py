"""Quality metrics — `camelot/utils.py:709-760`."""

from __future__ import annotations


def compute_accuracy(error_weights: list[list]) -> float:
    """Weighted score from per-textline assignment errors —
    `camelot/utils.py:709-736`. ``[[weight, [errors...]], ...]`` with
    weights summing to 100; empty error lists → 0.
    """
    SCORE_VAL = 100
    try:
        score = 0.0
        if sum(ew[0] for ew in error_weights) != SCORE_VAL:
            raise ValueError("Sum of weights should be equal to 100.")
        for ew in error_weights:
            weight = ew[0] / len(ew[1])
            for error_percentage in ew[1]:
                score += weight * (1 - error_percentage)
    except ZeroDivisionError:
        score = 0.0
    return score


def compute_whitespace(data: list[list[str]]) -> float:
    """Percentage of empty cells — `camelot/utils.py:739-760`."""
    whitespace = 0
    for row in data:
        for cell in row:
            if cell.strip() == "":
                whitespace += 1
    return 100 * (whitespace / float(len(data) * len(data[0])))
