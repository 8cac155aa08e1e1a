"""Query plans: the relational parity queries and the view catalog."""
