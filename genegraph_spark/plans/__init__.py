"""Pipeline assembly (the reference's interceptor chain as a linear
DataFrame plan)."""
