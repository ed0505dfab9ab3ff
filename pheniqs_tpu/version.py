__version__ = "1.0.0"

# Version of the reference feature set this build targets (pheniqs 2.1 API).
API_VERSION = "2.1"
