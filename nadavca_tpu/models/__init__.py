"""Pore models and model files (the 'model zoo' of this framework)."""
