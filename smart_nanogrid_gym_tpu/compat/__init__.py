from .gym_adapter import SmartNanogridEnv

__all__ = ["SmartNanogridEnv"]
