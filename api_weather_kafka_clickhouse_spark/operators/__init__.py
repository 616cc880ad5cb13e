# Modules self-register queries into ..registry on import (see
# registry._ensure_loaded).
