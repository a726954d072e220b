"""End-user pipelines composed from the stages."""
