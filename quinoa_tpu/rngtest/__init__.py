from .battery import SmallCrush, run_battery, TestResult

__all__ = ["SmallCrush", "run_battery", "TestResult"]
