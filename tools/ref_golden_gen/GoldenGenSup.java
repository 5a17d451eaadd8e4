// Supervised SFA golden: run the reference SFASupervised.fitWindowing on
// CBF (the WEASEL inner transform: INFORMATION_GAIN + lowerBounding=false)
// and print bestValues, bins, and windowed words for the first test series.
import sfa.timeseries.TimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.SFASupervised;

import java.io.File;

public class GoldenGenSup {
    static StringBuilder sb = new StringBuilder();

    static void words2d(short[][] words) {
        sb.append("[");
        for (int i = 0; i < words.length; i++) {
            if (i > 0) sb.append(",");
            sb.append("[");
            for (int j = 0; j < words[i].length; j++) {
                if (j > 0) sb.append(",");
                sb.append(words[i][j]);
            }
            sb.append("]");
        }
        sb.append("]");
    }

    static void bins(double[][] b) {
        sb.append("[");
        for (int i = 0; i < b.length; i++) {
            if (i > 0) sb.append(",");
            sb.append("[");
            for (int j = 0; j < b[i].length; j++) {
                if (j > 0) sb.append(",");
                double v = b[i][j];
                sb.append(v == Double.MAX_VALUE ? "\"inf\"" : Double.toString(v));
            }
            sb.append("]");
        }
        sb.append("]");
    }

    public static void main(String[] args) throws Exception {
        String fix = args[0];
        TimeSeries[] train = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TRAIN"));
        TimeSeries[] test = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TEST"));
        int window = 32, maxF = 6, symbols = 4;
        sb.append("{");
        for (boolean normMean : new boolean[]{true, false}) {
            SFASupervised sfa = new SFASupervised();
            sfa.fitWindowing(train, window, maxF, symbols, normMean, false);
            sb.append("\"sup_norm" + normMean + "\": {\"best\": [");
            for (int i = 0; i < sfa.bestValues.length; i++) {
                if (i > 0) sb.append(",");
                sb.append(sfa.bestValues[i]);
            }
            sb.append("], \"maxWordLength\": " + sfa.maxWordLength + ", \"bins\": ");
            bins(sfa.bins);
            sb.append(", \"test_words\": [");
            for (int q = 0; q < 8; q++) {
                if (q > 0) sb.append(",");
                words2d(sfa.transformWindowing(test[q]));
            }
            sb.append("]}");
            sb.append(normMean ? "," : "");
        }
        sb.append("}");
        System.out.println(sb.toString());
    }
}
