"""Custom operators that go beyond single-expression columns (multimodal
decode plumbing, stateful streaming ops)."""
