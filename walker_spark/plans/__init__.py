"""Crawl plans: the BSP round driver with checkpoint/resume."""
