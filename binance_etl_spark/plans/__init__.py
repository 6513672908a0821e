"""Query plans: the SURVEY.md §2 operator inventory as registered queries."""
