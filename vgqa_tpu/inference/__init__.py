"""Inference APIs: grounding.predict and qa.predict (reference schemas)."""
