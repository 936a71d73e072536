from .dp_pallas import bandedScorePallas, pallasAvailable
