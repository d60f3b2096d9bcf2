from .battery import SmallCrush, Crush, run_battery, TestResult

__all__ = ["SmallCrush", "Crush", "run_battery", "TestResult"]
