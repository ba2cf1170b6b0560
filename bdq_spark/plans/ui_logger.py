"""Spark-UI job-description tagging (context manager + decorator).

Parity target: `/root/reference/bdq/spark_ui_logger.py:7-65` (E11 in
SURVEY.md §2.2).  Maintains a thread-local stack of descriptions so nested
scopes render as ``pipeline#step.inner`` in the Spark UI, and restores the
parent description on exit.  Descriptions are thread-local properties in
Spark, so concurrent pipeline steps (each on its own driver thread) tag
only their own jobs.
"""

from __future__ import annotations

import functools
import logging
import threading
from typing import Callable, Optional

from pyspark.sql import SparkSession

__all__ = ["SparkUILogger"]


class SparkUILogger:
    """Context manager that sets the Spark job description for its scope."""

    default_log_level = logging.INFO
    _local = threading.local()

    def __init__(
        self,
        desc: str,
        spark: Optional[SparkSession] = None,
        log_level: Optional[int] = None,
    ):
        self._spark = spark or SparkSession.getActiveSession()
        if self._spark is None:
            raise ValueError("could not get active spark session")
        self._sc = self._spark.sparkContext
        self._desc = desc
        self.log = logging.getLogger(self.full_desc(desc))
        self.log.setLevel(log_level or self.default_log_level)

    @classmethod
    def _stack(cls) -> list:
        stack = getattr(cls._local, "stack", None)
        if stack is None:
            stack = cls._local.stack = []
        return stack

    @classmethod
    def full_desc(cls, desc: str) -> str:
        """Dot-joined path of the enclosing scopes plus ``desc``."""
        return ".".join(cls._stack() + [desc])

    def _apply(self, desc: Optional[str]) -> None:
        self._sc.setJobDescription(desc)
        self._sc.setLocalProperty("spark.job.description", desc)

    def __enter__(self) -> "SparkUILogger":
        stack = self._stack()
        self._apply(self.full_desc(self._desc))
        stack.append(self._desc)
        return self

    def __exit__(self, exc_type, exc_value, tb) -> None:
        stack = self._stack()
        popped = stack.pop()
        assert popped == self._desc, "SparkUILogger stack is corrupted"
        self._apply(".".join(stack) if stack else None)

    @staticmethod
    def tag(
        function: Optional[Callable] = None,
        desc: Optional[str] = None,
        log_level: Optional[int] = None,
    ):
        """Decorator form: tags every call with ``desc`` (default
        ``f.__qualname__``)."""

        def decorate(f: Callable) -> Callable:
            @functools.wraps(f)
            def wrapper(*args, **kwargs):
                with SparkUILogger(desc or f.__qualname__, log_level=log_level):
                    return f(*args, **kwargs)

            return wrapper

        if function is not None:
            return decorate(function)
        return decorate
