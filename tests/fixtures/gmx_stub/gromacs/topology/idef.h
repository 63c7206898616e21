#pragma once
#include "../gmx_stub_core.h"
